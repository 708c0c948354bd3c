package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.Cohorts

/** Retention triangle on a hand-computed fixture + the weekly granularity
  * path the driver query doesn't exercise.
  */
class CohortsSpec extends SparkSpec {
  init()
  import spark.implicits._

  private def ts(day: Int, hour: Int = 0) =
    Timestamp.valueOf(f"2024-01-$day%02d $hour%02d:00:00")

  test("daily retention triangle on a hand-computed fixture") {
    // cohort Jan-1: users 1,2 (u1 returns day2; u2 never)
    // cohort Jan-2: user 3 (returns day 3 and 4)
    val events = Seq(
      (1L, ts(1)), (1L, ts(1, 5)), (1L, ts(2)),
      (2L, ts(1, 3)),
      (3L, ts(2)), (3L, ts(3)), (3L, ts(4))).toDF("user_id", "ts")
    val got = Cohorts.retention(events, "user_id", "ts", "day", 1)
      .select(
        date_format(col("cohort"), "yyyy-MM-dd").as("c"),
        col("offset"), col("n_users"), col("cohort_size"), col("retention_bp"))
      .orderBy("c", "offset")
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      ("2024-01-01", 0L, 2L, 2L, 10000L),
      ("2024-01-01", 1L, 1L, 2L, 5000L),
      ("2024-01-02", 0L, 1L, 1L, 10000L),
      ("2024-01-02", 1L, 1L, 1L, 10000L),
      ("2024-01-02", 2L, 1L, 1L, 10000L)))
  }

  test("weekly granularity buckets offsets by 7 days") {
    val events = Seq(
      (1L, ts(1)), (1L, ts(9)), // week 0 and week 1 (Jan 1 / Jan 9)
      (2L, ts(1)), (2L, ts(3))) // both inside week 0
      .toDF("user_id", "ts")
    val got = Cohorts.retention(events, "user_id", "ts", "week", 7)
      .select(col("offset"), col("n_users"))
      .orderBy("offset")
      .as[(Long, Long)].collect().toSeq
    assert(got == Seq((0L, 2L), (1L, 1L)))
  }
}
