package graft

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.operators.{DeletionJoin, SimilarityJoin}

class DeletionJoinSpec extends SparkSpec {
  init()

  private lazy val docs = Tables(spark, sfSmoke, "documents")
  private lazy val toks = SimilarityJoin.tokenize(docs, "doc_id", "text")

  private def brutePairs(tau: Double) = {
    val a = toks.select(col("sid").as("x_id"), col("toks").as("x_toks"))
    val b = toks.select(col("sid").as("y_id"), col("toks").as("y_toks"))
    a.crossJoin(b).filter(col("x_id") < col("y_id"))
      .withColumn("inter", size(array_intersect(col("x_toks"), col("y_toks"))))
      .filter(
        col("inter").cast("double") /
          (size(col("x_toks")) + size(col("y_toks")) - col("inter")) >= tau)
      .select("x_id", "y_id")
  }

  test("deletion join equals the brute-force Jaccard pairs at sf0.001, tau=0.8") {
    val got = DeletionJoin.joinSets(toks, toks, 0.8, selfJoin = true)
      .select("x_id", "y_id")
    val brute = brutePairs(0.8)
    assert(got.count() == brute.count())
    assert(got.exceptAll(brute).isEmpty && brute.exceptAll(got).isEmpty)
  }

  test("deletion join equals the brute-force pairs at low tau=0.6 (deletions actually used)") {
    val got = DeletionJoin.joinSets(toks, toks, 0.6, selfJoin = true)
      .select("x_id", "y_id")
    val brute = brutePairs(0.6)
    assert(got.count() == brute.count())
    assert(got.exceptAll(brute).isEmpty && brute.exceptAll(got).isEmpty)
  }

  test("del×del arm (reference's fourth combo) adds candidates but never pairs") {
    // the completeness proof charges sd = 2 for the balanced-substitution
    // case del×del serves, so ΣV = Hls already detects those pairs through
    // another segment — the dd arm must leave the verified OUTPUT
    // identical at any tau while only ever ADDING candidate volume
    for (tau <- Seq(0.8, 0.6)) {
      val base = DeletionJoin.joinSets(toks, toks, tau, selfJoin = true)
        .select("x_id", "y_id")
      val dd = DeletionJoin.joinSets(toks, toks, tau, selfJoin = true, delDel = true)
        .select("x_id", "y_id")
      assert(dd.count() == base.count(), s"tau=$tau")
      assert(dd.exceptAll(base).isEmpty && base.exceptAll(dd).isEmpty, s"tau=$tau")
    }
  }

  test("del×del equality holds on adversarial near-miss token sets") {
    // dense near-tau pairs from a small alphabet — the regime where a
    // genuinely-needed fourth arm would show up as missing pairs in the
    // default form
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val rows = (1L to 250L).map { id =>
      val n = 4 + rnd.nextInt(12)
      val t = scala.collection.mutable.LinkedHashSet.empty[String]
      while (t.size < n) t += s"t${rnd.nextInt(40)}"
      (id, t.mkString(" "))
    }
    val docs = rows.toDF("doc_id", "text")
    val tk = SimilarityJoin.tokenize(docs, "doc_id", "text")
    val base = DeletionJoin.joinSets(tk, tk, 0.6, selfJoin = true)
      .select("x_id", "y_id")
    val dd = DeletionJoin.joinSets(tk, tk, 0.6, selfJoin = true, delDel = true)
      .select("x_id", "y_id")
    assert(dd.count() == base.count())
    assert(dd.exceptAll(base).isEmpty && base.exceptAll(dd).isEmpty)
  }

  test("deletion join equals prefix join on adversarial random token sets") {
    // records built from a small alphabet so near-miss pairs (J just below
    // and at tau) are dense — the regime where an unsound allocation or a
    // missing deletion combo would drop pairs
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = (1L to 300L).map { id =>
      val n = 4 + rnd.nextInt(12)
      val t = scala.collection.mutable.LinkedHashSet.empty[String]
      while (t.size < n) t += s"t${rnd.nextInt(40)}"
      (id, t.mkString(" "))
    }
    val df = rows.toDF("doc_id", "text")
    val t = SimilarityJoin.tokenize(df, "doc_id", "text")
    val got = DeletionJoin.joinSets(t, t, 0.7, selfJoin = true)
      .select("x_id", "y_id")
    val want = SimilarityJoin.prefixJoin(t, t, 0.7, selfJoin = true)
      .select("x_id", "y_id")
    assert(got.count() == want.count())
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("V-greedy allocation: cheapest segments first, two-phase") {
    // three segments, hls=3: seg 1 is free twice (c01=0, c12=1); seg 0
    // cheap once (c01=2); seg 2 expensive (c01=9)
    val v = DeletionJoin.allocateV(Seq((0, 2L, 5L), (1, 0L, 1L), (2, 9L, 9L)), hls = 3)
    assert(v.toSeq == Seq(1, 2, 0))
  }

  test("V-greedy allocation caps at 2 per segment and exhausts the budget") {
    val v = DeletionJoin.allocateV(Seq((0, 1L, 1L), (1, 1L, 1L)), hls = 4)
    assert(v.toSeq == Seq(2, 2))
    val v2 = DeletionJoin.allocateV(Seq((0, 1L, 1L), (1, 1L, 1L)), hls = 99)
    assert(v2.toSeq == Seq(2, 2)) // clamped, never loops
  }

  test("allocation size never exceeds twice the segment count for admissible lengths") {
    for (tau <- Seq(0.6, 0.7, 0.8, 0.9); hi <- 1 to 200) {
      val h = DeletionJoin.deletionSegmentCount(hi, tau)
      val sMax = math.floor(hi / tau + 1e-4).toInt
      for (s <- math.max(1, math.ceil(tau * hi - 1e-4).toInt) to sMax) {
        val hls = DeletionJoin.allocationSize(s, hi, tau)
        assert(hls <= 2 * h, s"tau=$tau hi=$hi s=$s: hls=$hls > 2*h=${2 * h}")
      }
    }
  }

  test("deletion join: single-token and identical docs") {
    import spark.implicits._
    // single-token segments exercise the empty-deletion ("" content) path
    val df = Seq((1L, "a"), (2L, "a"), (3L, "b"), (4L, "a b")).toDF("doc_id", "text")
    val t = SimilarityJoin.tokenize(df, "doc_id", "text")
    val got = DeletionJoin.joinSets(t, t, 0.5, selfJoin = true)
      .select("x_id", "y_id").as[(Long, Long)].collect().toSet
    // J(1,2)=1, J(1,4)=J(2,4)=0.5, J(3,4)=0.5; b pairs with a-docs at J=0
    assert(got == Set((1L, 2L), (1L, 4L), (2L, 4L), (3L, 4L)))
  }

  test("deletion join plans no cartesian product") {
    val plan = DeletionJoin.joinSets(toks, toks, 0.8, selfJoin = true)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
  }
}
