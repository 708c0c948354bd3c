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

  test("IQR fences: exact percentile_disc quartiles, per-group, both tails") {
    import spark.implicits._
    // group a: values 1..8 plus outliers -100 and 100.
    // n = 10: q1 = value at rank ceil(10/4)=3 -> 2; q3 at rank 8 -> 7;
    // IQR = 5, fences (k=3/2): [2-7.5, 7+7.5] = [-5.5, 14.5]
    val df = ((1L to 8L).map(v => (v, "a", v)) ++
      Seq((100L, "a", -100L), (101L, "a", 100L)) ++
      (1L to 8L).map(v => (200L + v, "b", 1000L * v)))
      .toDF("id", "g", "v")
    val got = Anomaly.iqrOutliers(df, "g", "v")
      .select("id", "q1", "q3").as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got.map(_._1) == Seq(100L, 101L), s"got $got")
    assert(got.head._2 == 2L && got.head._3 == 7L)
    // k = 0 collapses the fences to the quartiles themselves
    val strict = Anomaly.iqrOutliers(df.filter($"g" === "a"), "g", "v", kNum = 0L)
      .select("v").as[Long].collect().toSet
    assert(strict == Set(-100L, 1L, 100L, 8L)) // everything outside [2, 7]
  }

  test("iqr_outliers TVF matches the operator") {
    import spark.implicits._
    val df = ((1L to 20L).map(v => (v, "g", v * v))).toDF("id", "g", "v")
    df.createOrReplaceTempView("iqr_in")
    val sqlDf = spark.sql("SELECT * FROM iqr_outliers('iqr_in', 'g', 'v', 3, 2)")
    val scalaDf = Anomaly.iqrOutliers(df, "g", "v")
    assert(sqlDf.columns.toSeq == scalaDf.columns.toSeq)
    assert(sqlDf.exceptAll(scalaDf).isEmpty && scalaDf.exceptAll(sqlDf).isEmpty)
  }
}
