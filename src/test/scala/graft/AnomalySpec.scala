package graft

import graft.operators.Anomaly

/** MAD outlier semantics on a hand-computed fixture + robustness: the
  * outlier itself must not drag the threshold the way mean/stddev would.
  */
class AnomalySpec extends SparkSpec {
  init()
  import spark.implicits._

  test("hand-computed median/MAD flag") {
    // group g: values 10,12,14,16,100 → med=14 (ceil-rank), dev=4,2,0,2,86
    // → mad=2 → threshold 3*2=6 → only 100 flagged
    val df = Seq(
      (1L, "g", 10L), (2L, "g", 12L), (3L, "g", 14L), (4L, "g", 16L), (5L, "g", 100L))
      .toDF("id", "g", "v")
    val got = Anomaly.madOutliers(df, "g", "v", k = 3)
      .select("id", "v", "med", "mad", "dev")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((5L, 100L, 14L, 2L, 86L)))
  }

  test("robust to the outlier's own magnitude (mean/stddev would not be)") {
    // same data with the outlier 100× bigger: flag set unchanged
    val df = Seq(
      (1L, "g", 10L), (2L, "g", 12L), (3L, "g", 14L), (4L, "g", 16L), (5L, "g", 10000L))
      .toDF("id", "g", "v")
    val got = Anomaly.madOutliers(df, "g", "v", k = 3)
      .select("id").as[Long].collect().toSeq
    assert(got == Seq(5L))
  }

  test("groups are independent") {
    val df = Seq(
      (1L, "a", 10L), (2L, "a", 11L), (3L, "a", 12L), (4L, "a", 500L),
      (5L, "b", 500L), (6L, "b", 510L), (7L, "b", 520L))
      .toDF("id", "g", "v")
    val got = Anomaly.madOutliers(df, "g", "v", k = 3)
      .select("id").as[Long].collect().toSeq
    // 500 is an outlier in group a, normal in group b
    assert(got == Seq(4L))
  }
}
