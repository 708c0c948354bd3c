package graft

import graft.operators.DiffInDiff

class DiffInDiffSpec extends SparkSpec {
  init()
  import spark.implicits._

  private def run(rows: Seq[(String, String, Long)]): (Long, Long, Long, Long, Long) = {
    val r = DiffInDiff.estimate(rows.toDF("arm", "period", "y"),
        "arm", "period", "y", "t", "c", "pre", "post")
      .as[(Long, Long, Long, Long, Long, Long, Long, Long, Long)].head()
    (r._5, r._6, r._7, r._8, r._9)
  }

  test("a shared trend cancels; only the treatment lift survives") {
    // control: 10 -> 14 (trend +4); treat: 10 -> 19 (trend +4, lift +5)
    val rows =
      (0 until 20).map(_ => ("c", "pre", 10L)) ++
      (0 until 20).map(_ => ("c", "post", 14L)) ++
      (0 until 20).map(_ => ("t", "pre", 10L)) ++
      (0 until 20).map(_ => ("t", "post", 19L))
    val (tp, tq, cp, cq, did) = run(rows)
    assert((tp, tq, cp, cq) == ((10000000L, 19000000L, 10000000L, 14000000L)))
    assert(did == 5000000L)
  }

  test("floored cell means compose exactly (thirds)") {
    // means of 1/3 flavor: floor each cell in ppm, then difference
    val rows =
      Seq(("c", "pre", 0L), ("c", "pre", 0L), ("c", "pre", 1L)) ++
      Seq(("c", "post", 1L), ("c", "post", 1L), ("c", "post", 0L)) ++
      Seq(("t", "pre", 1L), ("t", "pre", 0L), ("t", "pre", 0L)) ++
      Seq(("t", "post", 1L), ("t", "post", 1L), ("t", "post", 1L))
    val (tp, tq, cp, cq, did) = run(rows)
    assert(tp == 333333L && tq == 1000000L && cp == 333333L && cq == 666666L)
    assert(did == (1000000L - 333333L) - (666666L - 333333L))
  }

  test("an empty (arm, period) cell fails by name instead of vanishing") {
    // no ('c', 'pre') rows: the crossJoin form would return ZERO rows
    val rows =
      Seq(("c", "post", 1L), ("t", "pre", 1L), ("t", "post", 2L))
    val ex = intercept[Exception] {
      DiffInDiff.estimate(rows.toDF("arm", "period", "y"),
        "arm", "period", "y", "t", "c", "pre", "post").collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(m =>
      m.contains("zero rows") && m.contains("'c'") && m.contains("'pre'")))
  }

  test("foreign labels fail by name") {
    val rows = Seq(("x", "pre", 1L))
    val ex = intercept[Exception] {
      DiffInDiff.estimate(rows.toDF("arm", "period", "y"),
        "arm", "period", "y", "t", "c", "pre", "post").collect()
    }
    assert(ex.getMessage.contains("arm must be")
      || ex.getCause != null && ex.getCause.getMessage.contains("arm must be"))
  }
}
