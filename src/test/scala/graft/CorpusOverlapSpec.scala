package graft

import graft.operators.CorpusOverlap

class CorpusOverlapSpec extends SparkSpec {
  init()

  import spark.implicits._

  /** Brute-force oracle over Scala shingle sets. */
  private def brute(
      docs: Seq[(String, String)], k: Int): Map[(String, String), (Long, Long, Long)] = {
    def shingles(text: String): Set[String] = {
      val ts = text.split(" ").filter(_.nonEmpty)
      if (ts.length < k) Set.empty
      else ts.sliding(k).map(_.mkString(" ")).toSet
    }
    val perSrc = docs.groupBy(_._1).view
      .mapValues(_.map(d => shingles(d._2)).foldLeft(Set.empty[String])(_ ++ _)).toMap
    val srcs = perSrc.keys.toSeq.sorted
    (for {
      (a, i) <- srcs.zipWithIndex; b <- srcs.drop(i + 1)
      common = (perSrc(a) & perSrc(b)).size.toLong if common > 0
    } yield (a, b) -> ((common, perSrc(a).size.toLong, perSrc(b).size.toLong))).toMap
  }

  test("matches the brute-force shingle-set matrix on a designed fixture") {
    val docs = Seq(
      ("s1", "the quick brown fox jumps over the lazy dog"),
      ("s1", "pack my box with five dozen liquor jugs"),
      ("s2", "the quick brown fox sleeps all day long"), // shares 2 shingles w/ s1
      ("s2", "entirely different words in this one"),
      ("s3", "pack my box with five dozen liquor jugs"), // exact dup of an s1 doc
      ("s3", "the quick brown fox jumps over white fences"), // shares w/ s1 AND s2
      ("s4", "no sharing here at all whatsoever tonight"))
    val df = docs.toDF("source", "text")
    val got = CorpusOverlap.overlapMatrix(df, "source", "text", k = 3)
      .as[(String, String, Long, Long, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
    assert(got == brute(docs, 3), s"got $got\nwant ${brute(docs, 3)}")
    // s4 shares nothing: absent from every pair
    assert(!got.keys.exists(p => p._1 == "s4" || p._2 == "s4"))
  }

  test("basis-point divisions are exact floors; full containment reads 10000") {
    val docs = Seq(
      ("a", "one two three four five"),   // 3 3-shingles
      ("b", "one two three four five six")) // 4, superset of a's
    val df = docs.toDF("source", "text")
    val r = CorpusOverlap.overlapMatrix(df, "source", "text", k = 3)
      .as[(String, String, Long, Long, Long, Long, Long, Long)].collect()
    assert(r.length == 1)
    val (a, b, common, nA, nB, j, ca, cb) = (r(0)._1, r(0)._2, r(0)._3, r(0)._4,
      r(0)._5, r(0)._6, r(0)._7, r(0)._8)
    assert((a, b, common, nA, nB) == (("a", "b", 3L, 3L, 4L)))
    assert(j == 10000L * 3 / 4)    // 3 / (3 + 4 − 3)
    assert(ca == 10000L)           // all of a inside b
    assert(cb == 10000L * 3 / 4)
  }

  test("k = 1 degrades to distinct-token overlap; short docs drop out") {
    val docs = Seq(
      ("x", "alpha beta"), ("x", ""), // empty doc contributes nothing
      ("y", "beta gamma"))
    val got = CorpusOverlap.overlapMatrix(docs.toDF("source", "text"), "source", "text", 1)
      .as[(String, String, Long, Long, Long, Long, Long, Long)].collect()
    assert(got.length == 1 && got(0)._3 == 1L && got(0)._4 == 2L && got(0)._5 == 2L)
    assert(got(0)._6 == 10000L / 3) // J = 1/3
  }

  test("matches brute force on the smoke corpus (all source pairs)") {
    val docs = graft.core.Tables(spark, sfSmoke, "documents")
      .selectExpr("source", "text").as[(String, String)].collect().toSeq
    val got = CorpusOverlap
      .overlapMatrix(graft.core.Tables(spark, sfSmoke, "documents"), "source", "text", 3)
      .as[(String, String, Long, Long, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
    assert(got == brute(docs, 3))
  }
}
