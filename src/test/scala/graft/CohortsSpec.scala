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

  test("RFM: five users with strictly ordered metrics land in quintiles 1..5") {
    // user u has u events, each of 100·u cents, last event (5−u) days ago:
    // recency, frequency, monetary all order u=1 (worst) … u=5 (best)
    val events = (1L to 5L).flatMap { u =>
      (1L to u).map(i => (u, (5L - u) * -86400L + 1000000000L - i, u * 100L))
    }.toDF("user_id", "tsec", "cents")
    val asOf = 1000000000L
    val got = graft.operators.Cohorts.rfm(events, "user_id", "tsec", "cents", asOf)
      .orderBy("user_id")
      .as[(Long, Long, Long, Long, Int, Int, Int)].collect().toSeq
    got.foreach { case (u, rDays, f, m, rq, fq, mq) =>
      assert(f == u && m == u * u * 100)
      assert(rDays == 5 - u || rDays == 6 - u) // sub-day offsets floor either side
      assert(rq == u && fq == u && mq == u, s"user $u got ($rq,$fq,$mq)")
    }
  }

  test("RFM quintiles agree with percentileRanks' exact cume_dist") {
    val ev = graft.core.Tables(spark, sfSmoke, "events")
      .select(
        col("user_id"),
        expr("unix_micros(ts) div 1000000").as("tsec"),
        round(col("value") * 100).cast("long").as("cents"))
    val asOf = ev.agg(max("tsec")).head().getLong(0)
    val got = graft.operators.Cohorts.rfm(ev, "user_id", "tsec", "cents", asOf)
    // recompute f_q from first principles on the collected metrics
    val fs = got.select("f").as[Long].collect().sorted
    val n = fs.length
    got.select("f", "f_q").as[(Long, Int)].collect().foreach { case (f, fq) =>
      val cumLe = fs.count(_ <= f).toLong
      val expect = (((cumLe * 10000) / n + 1999) / 2000).toInt
      assert(fq == expect, s"f=$f")
    }
  }
}
