package graft

import graft.operators.Fusion

/** RRF semantics: agreement across lists beats a single high rank, the
  * integer contributions match the hand formula, and missing items
  * contribute nothing.
  */
class FusionSpec extends SparkSpec {
  init()
  import spark.implicits._

  test("hand-computed fusion of two rankings") {
    // list A: x@1, y@2, z@3; list B: y@1, x@2 (z absent)
    val a = Seq(("x", 1L), ("y", 2L), ("z", 3L)).toDF("id", "rank")
    val b = Seq(("y", 1L), ("x", 2L)).toDF("id", "rank")
    val got = Fusion.rrf(Seq(a, b), "id", "rank", kConst = 60L, scale = 1000000L, topK = 10)
      .orderBy("rk")
      .as[(String, Long, Long, Int)].collect().toSeq
    val c = (r: Long) => 1000000L / (60L + r)
    assert(got == Seq(
      ("x", c(1) + c(2), 2L, 1), // 16393+16129=32522
      ("y", c(2) + c(1), 2L, 2), // same total, id tiebreak
      ("z", c(3), 1L, 3)))
    assert(got.head._2 == 32522L)
  }

  test("consensus item outranks a single rank-1 appearance") {
    val a = Seq(("solo", 1L), ("both", 2L)).toDF("id", "rank")
    val b = Seq(("both", 2L), ("other", 1L)).toDF("id", "rank")
    val top = Fusion.rrf(Seq(a, b), "id", "rank", 60L, 1000000L, 3)
      .orderBy("rk").as[(String, Long, Long, Int)].collect()
    assert(top.head._1 == "both", s"consensus must win: ${top.toSeq}")
  }
}
