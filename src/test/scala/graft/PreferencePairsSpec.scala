package graft

import graft.operators.PreferencePairs

class PreferencePairsSpec extends SparkSpec {
  init()
  import spark.implicits._

  private def cands = Seq(
    ("p1", "r1", 10L), ("p1", "r2", 50L), ("p1", "r3", 30L),
    ("p2", "r4", 7L),                       // singleton — no pair
    ("p3", "r5", 5L), ("p3", "r6", 5L),     // all tied — no pair
    ("p4", "r7", 9L), ("p4", "r8", 8L)      // margin 1
  ).toDF("prompt", "resp", "score")

  test("best vs worst per group, singletons and all-tied groups dropped") {
    val got = PreferencePairs.pairs(cands, "prompt", "resp", "score", minMargin = 0L)
      .orderBy("g").as[(String, Long, String, Long, String, Long, Long)]
      .collect().toSeq
    assert(got == Seq(
      ("p1", 3L, "r2", 50L, "r1", 10L, 40L),
      ("p4", 2L, "r7", 9L, "r8", 8L, 1L)))
  }

  test("minMargin filters near-ties") {
    val got = PreferencePairs.pairs(cands, "prompt", "resp", "score", minMargin = 2L)
      .select("g").as[String].collect().toSeq
    assert(got == Seq("p1"))
  }

  test("score ties break toward the smaller id on both ends") {
    val tied = Seq(
      ("p", "b", 9L), ("p", "a", 9L), ("p", "z", 1L), ("p", "y", 1L))
      .toDF("prompt", "resp", "score")
    val got = PreferencePairs.pairs(tied, "prompt", "resp", "score", 0L)
      .as[(String, Long, String, Long, String, Long, Long)].head()
    assert(got == (("p", 4L, "a", 9L, "y", 1L, 8L)))
  }

  test("preference_pairs TVF round-trips the Scala path") {
    cands.createOrReplaceTempView("pp_cands")
    val tvf = spark.sql(
      "SELECT * FROM preference_pairs('pp_cands', 'prompt', 'resp', 'score', 0)")
      .orderBy("g").collect().toSeq
    val direct = PreferencePairs.pairs(cands, "prompt", "resp", "score", 0L)
      .orderBy("g").collect().toSeq
    assert(tvf == direct)
  }
}
