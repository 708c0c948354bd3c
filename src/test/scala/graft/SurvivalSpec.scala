package graft

import graft.operators.Survival


class SurvivalSpec extends SparkSpec {
  init()
  import spark.implicits._

  test("hand-computed curve: events step, censoring shrinks the risk set silently") {
    // subjects: event@1, censor@2, two events@3, censor@4, event@5
    val df = Seq(("a", 1L, 1), ("a", 2L, 0), ("a", 3L, 1), ("a", 3L, 1),
      ("a", 4L, 0), ("a", 5L, 1)).toDF("g", "t", "e")
    val got = Survival.kaplanMeier(df, "g", "t", "e")
      .orderBy("t").as[(String, Long, Long, Long, Long)].collect().toSeq
    // t=1: n=6 d=1 -> floor(1e6*5/6); t=3: n=4 d=2 -> floor(prev*2/4); t=5: n=1 d=1 -> 0
    assert(got == Seq(
      ("a", 1L, 6L, 1L, 833333L),
      ("a", 3L, 4L, 2L, 416666L),
      ("a", 5L, 1L, 1L, 0L)))
  }

  test("censored-only times produce no step; all-censored group produces no rows") {
    val df = Seq(("a", 1L, 0), ("a", 2L, 1), ("b", 1L, 0), ("b", 2L, 0))
      .toDF("g", "t", "e")
    val got = Survival.kaplanMeier(df, "g", "t", "e")
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(("a", 2L, 1L, 1L, 0L)))
  }

  test("groups are independent curves") {
    val df = Seq(("a", 1L, 1), ("a", 2L, 1), ("b", 1L, 1)).toDF("g", "t", "e")
    val got = Survival.kaplanMeier(df, "g", "t", "e")
      .orderBy("g", "t").as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      ("a", 1L, 2L, 1L, 500000L),
      ("a", 2L, 1L, 1L, 0L),
      ("b", 1L, 1L, 1L, 0L)))
  }

  test("deterministic under repartition") {
    val df = (1 to 300).map(i => ("g" + i % 4, (i % 17).toLong, i % 3 min 1))
      .toDF("g", "t", "e")
    val a = Survival.kaplanMeier(df, "g", "t", "e").orderBy("g", "t").collect().toSeq
    val b = Survival.kaplanMeier(df.repartition(11), "g", "t", "e")
      .orderBy("g", "t").collect().toSeq
    assert(a == b)
  }

  test("contract violations fail by name") {
    val neg = Seq(("a", -1L, 1)).toDF("g", "t", "e")
    val exN = intercept[Exception] {
      Survival.kaplanMeier(neg, "g", "t", "e").collect()
    }
    assert(exN.getMessage.contains("durations must be >= 0")
      || exN.getCause != null && exN.getCause.getMessage.contains("durations must be >= 0"))
    val badE = Seq(("a", 1L, 2)).toDF("g", "t", "e")
    val exE = intercept[Exception] {
      Survival.kaplanMeier(badE, "g", "t", "e").collect()
    }
    assert(exE.getMessage.contains("event flag")
      || exE.getCause != null && exE.getCause.getMessage.contains("event flag"))
    val many = (0 until 100).map(i => ("hot", i.toLong, 1)).toDF("g", "t", "e")
    val exG = intercept[Exception] {
      Survival.kaplanMeier(many, "g", "t", "e", maxStepsPerGroup = 10).collect()
    }
    assert(exG.getMessage.contains("Survival.kaplanMeier")
      || exG.getCause != null && exG.getCause.getMessage.contains("Survival.kaplanMeier"))
  }
}
