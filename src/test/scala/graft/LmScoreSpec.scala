package graft

import org.apache.spark.sql.functions._

import graft.operators.LmScore

/** LM familiarity bucketing vs an in-test brute force of the exact
  * fixed-point definition, plus the plan guarantee that makes it scale: no
  * window operator anywhere (thresholds come from the bounded histogram,
  * never a global sort).
  */
class LmScoreSpec extends SparkSpec {
  init()
  import spark.implicits._

  private def brute(
      docs: Seq[(Long, String)], minCount: Long): Map[Long, (Long, Long, Long, String)] = {
    val pairs = docs.flatMap { case (id, t) =>
      val w = t.split(" ").filter(_.nonEmpty)
      w.zip(w.drop(1)).map(p => (id, p))
    }
    val biAll = pairs.groupBy(_._2).map { case (k, v) => k -> v.size.toLong }
    val bi = biAll.filter(_._2 >= minCount)
    val ctx = pairs.groupBy(_._2._1).map { case (k, v) => k -> v.size.toLong }
    val perDoc = docs.map { case (id, _) =>
      val mine = pairs.filter(_._1 == id).map(_._2)
      val n = mine.size.toLong
      val oov = mine.count(p => !bi.contains(p)).toLong
      val s = mine.map(p => bi.get(p).map(c => 10000L * c / ctx(p._1)).getOrElse(0L)).sum
      val score = if (n == 0) 0L else s / n
      id -> (n, oov, score)
    }.toMap
    val n = docs.size.toLong
    val desc = perDoc.toSeq.map { case (id, (_, _, sc)) => (sc, id) }
      .sortBy { case (sc, id) => (-sc, id) }
    val t1 = desc(((n + 2) / 3 - 1).toInt)._1
    val t2 = desc(((2 * n + 2) / 3 - 1).toInt)._1
    perDoc.map { case (id, (nb, oov, sc)) =>
      val b = if (sc >= t1) "head" else if (sc >= t2) "middle" else "tail"
      id -> (nb, oov, sc, b)
    }
  }

  test("matches the brute-force fixed-point definition, ties share buckets") {
    // Three score strata + a tie pair straddling the tercile boundary and
    // a token-free doc (score 0, counted in n).
    val docs = Seq[(Long, String)](
      1L -> "the cat sat the cat sat the cat sat",
      2L -> "the cat sat the cat sat",
      3L -> "the cat sat on a rare mat",
      4L -> "rare words only here now",
      5L -> "the cat sat the cat sat",
      6L -> "on a on a on a on a",
      7L -> "")
    val got = LmScore
      .familiarityBuckets(docs.toDF("doc_id", "text"), "doc_id", "text", minCount = 3)
      .as[(Long, Long, Long, Long, String)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4, r._5)).toMap
    assert(got == brute(docs, minCount = 3), s"got $got")
  }

  test("bucket rule is value-based: every head score >= middle >= tail") {
    val docs = core.Tables(spark, sfSmoke, "documents")
    val out = LmScore.familiarityBuckets(docs, "doc_id", "text")
      .select("score_bp", "bucket").as[(Long, String)].collect()
    val n = out.length.toLong
    def scores(b: String) = out.filter(_._2 == b).map(_._1)
    val (h, m, tl) = (scores("head"), scores("middle"), scores("tail"))
    assert(h.nonEmpty && h.length >= ((n + 2) / 3).toInt)
    if (m.nonEmpty) assert(h.min >= m.max)
    if (tl.nonEmpty && m.nonEmpty) assert(m.min > tl.max)
    if (tl.nonEmpty && m.isEmpty) assert(h.min > tl.max)
  }

  test("no window operator in the plan (histogram thresholds, not rank)") {
    val docs = core.Tables(spark, sfSmoke, "documents")
    val plan = LmScore.familiarityBuckets(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"global-sort window leaked into the plan:\n$plan")
  }

  test("deterministic across runs") {
    val docs = core.Tables(spark, sfSmoke, "documents")
    def run() = LmScore.familiarityBuckets(docs, "doc_id", "text")
      .orderBy("doc_id").collect().toSeq
    assert(run() == run())
  }

  test("cross-corpus form with ref = docs equals the self-corpus form") {
    // the self-corpus pass is the ref == docs special case of the
    // cross-corpus pass: the reference LM tables derive from the same
    // occurrence counts, so every score and bucket must agree
    val docs = core.Tables(spark, sfSmoke, "documents")
    val self = LmScore.familiarityBuckets(docs, "doc_id", "text")
    val cross = LmScore.familiarityBucketsAgainst(docs, "doc_id", "text", docs, "text")
    assert(cross.exceptAll(self).isEmpty && self.exceptAll(cross).isEmpty)
  }

  test("cross-corpus: bigrams with reference-unknown prefixes are OOV, not dropped") {
    import spark.implicits._
    // ref knows only "a b" (5x, admitted); the scored doc has one admitted
    // bigram and one whose prefix 'z' the reference never saw — n_bigrams
    // must count BOTH (an inner ctx join would silently drop the second)
    val ref = (1L to 5L).map(i => (i, "a b")).toDF("doc_id", "text")
    val docs = Seq((10L, "a b"), (11L, "z q")).toDF("doc_id", "text")
    val got = LmScore.familiarityBucketsAgainst(docs, "doc_id", "text", ref, "text")
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long, String)].collect().toSeq
    // doc 10: 1 bigram, admitted, p = 10000*5/5 = 10000; doc 11: 1 bigram, OOV
    assert(got.map(r => (r._1, r._2, r._3, r._4)) ==
      Seq((10L, 1L, 0L, 10000L), (11L, 1L, 1L, 0L)))
  }

  test("Kneser-Ney: seen / unseen-bigram / unseen-context arms, exact fixed point") {
    import spark.implicits._
    // train bigrams: (a,b)x2, (a,c)x1, (d,b)x1 -> NT=3
    // ctx(a)=3, n1w(a)=2; ctx(d)=1, n1w(d)=1
    // ncont(b)=2, ncont(c)=1
    val train = Seq((1L, "a b"), (2L, "a b"), (3L, "a c"), (4L, "d b"))
      .toDF("doc_id", "text")
    val docs = Seq(
      (10L, "a b"), // seen:  ((4*2-3)*3 + 3*2*2)/(4*3*3) = 27/36 -> 7500
      (11L, "a d"), // unseen bigram, seen ctx a: 3*2*0/(4*3*3) -> 0 (d has no ncont)
      (12L, "a c"), // seen:  ((4*1-3)*3 + 3*2*1)/36 = 9/36 -> 2500
      (13L, "z b"), // unseen ctx: ncont(b)/NT = 2/3 -> 6666
      (14L, "z z")  // unseen ctx, unseen next -> 0
    ).toDF("doc_id", "text")
    val got = LmScore.knFamiliarity(docs, "doc_id", "text", train, "text")
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (10L, 1L, 0L, 7500L),
      (11L, 1L, 1L, 0L),
      (12L, 1L, 0L, 2500L),
      (13L, 1L, 1L, 6666L),
      (14L, 1L, 1L, 0L)))
    // the KN distribution is proper: summing p over ALL nexts of a seen
    // context stays under 10000 (strictly, by the floor)
    val nexts = Seq((20L, "a b"), (21L, "a c"), (22L, "a d")).toDF("doc_id", "text")
    val mass = LmScore.knFamiliarity(nexts, "doc_id", "text", train, "text")
      .agg(sum("score_bp")).head().getLong(0)
    assert(mass <= 10000L && mass >= 9990L, s"KN mass over context 'a' = $mass")
  }

  test("kn_familiarity TVF matches the operator") {
    import spark.implicits._
    val train = Seq((1L, "a b"), (2L, "a b"), (3L, "a c")).toDF("doc_id", "text")
    val docs = Seq((10L, "a b c"), (11L, "b a")).toDF("doc_id", "text")
    train.createOrReplaceTempView("kn_train")
    docs.createOrReplaceTempView("kn_docs")
    val sqlDf = spark.sql(
      "SELECT * FROM kn_familiarity('kn_docs', 'doc_id', 'text', 'kn_train', 'text')")
    val scalaDf = LmScore.knFamiliarity(docs, "doc_id", "text", train, "text")
    assert(sqlDf.columns.toSeq == scalaDf.columns.toSeq)
    assert(sqlDf.exceptAll(scalaDf).isEmpty && scalaDf.exceptAll(sqlDf).isEmpty)
  }
}
