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
      val expect = ((5 * cumLe + n - 1) / n).toInt
      assert(fq == expect, s"f=$f")
    }
  }

  test("RFM: quintile never 0 on a near-unique metric above 10k users") {
    // 10007 users, all-distinct m_cents: the old pct_bp-floor formula gave
    // q = 0 to the lowest earner once 10000·cum_le < n (ADVICE r10); the
    // cum_le-derived quintile stays in 1..5 with exact 1/5 buckets
    val events = (1L to 10007L).map(u => (u, 1000000000L - u, u * 7L))
      .toDF("user_id", "tsec", "cents")
    val got = Cohorts.rfm(events, "user_id", "tsec", "cents", 1000000000L)
      .select("m_cents", "m_q").as[(Long, Int)].collect()
    assert(got.forall { case (_, q) => q >= 1 && q <= 5 })
    // m_cents = 7u is rank u: u=1 must be quintile 1, u=n quintile 5
    val byCents = got.toMap
    assert(byCents(7L) == 1 && byCents(7L * 10007L) == 5)
    // exact quintile populations: ceil(5u/n) buckets differ by at most 1
    val sizes = got.groupBy(_._2).view.mapValues(_.length).toMap
    assert(sizes.values.max - sizes.values.min <= 1, sizes.toString)
  }

  test("RFM plan: no mandatory broadcast of a value-grain rank relation") {
    // the only hinted broadcast is the one-row population total; the three
    // quintile joins must stay hint-free (a near-unique metric makes the
    // rank relation user-grain — a forced broadcast there OOMs at scale)
    val events = Seq((1L, 100L, 5L), (2L, 90L, 6L)).toDF("user_id", "tsec", "cents")
    val plan = Cohorts.rfm(events, "user_id", "tsec", "cents", 1000L)
      .queryExecution.analyzed
    // every broadcast hint in the tree must wrap a bounded relation
    // (percentileRanks' group/offset relations, the one-row population
    // total) — never one that ships the metric VALUES or quintile labels,
    // i.e. the distinct-value-grain rank relation of the old forced
    // broadcast (user-grain for m_cents at scale)
    val valueGrain = Set("m_cents", "f", "__negr", "r_q", "f_q", "m_q", "user_id")
    val hinted = plan.collect {
      case h: org.apache.spark.sql.catalyst.plans.logical.ResolvedHint => h
      case h: org.apache.spark.sql.catalyst.plans.logical.UnresolvedHint => h
    }
    assert(hinted.nonEmpty, "expected the bounded singleton hints to be present")
    val offending = hinted.filter(_.output.map(_.name).toSet.intersect(valueGrain).nonEmpty)
    assert(offending.isEmpty,
      s"value-grain relation under a broadcast hint:\n${offending.mkString("\n")}")
  }
}
