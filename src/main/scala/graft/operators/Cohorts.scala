package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Retention-cohort analysis over an event stream: bucket every user by
  * the period of their FIRST activity (their cohort), then count how many
  * of each cohort's users are still active k periods later — the
  * (cohort × offset) retention triangle every product-analytics pipeline
  * derives from raw events.
  *
  * Scale shape: two aggregations, both keyed on high-cardinality columns
  * that hash-partition evenly (user_id, then (cohort, offset)), with the
  * user-period activity set deduplicated BEFORE the join (one row per
  * user-period, not per event — at 10^5 events/user that is the
  * difference between joining events and joining summaries). The
  * first-seen relation joins the activity relation on user_id —
  * co-partitioned by the preceding aggregations, so AQE plans it without
  * a broadcast-sized assumption on the user dimension.
  */
object Cohorts {

  private def trunc(granularity: String, c: Column): Column =
    date_trunc(granularity, c)

  /** Retention triangle: (cohort, offset, n_users, cohort_size,
    * retention_bp) — retention as integer basis points of the cohort's
    * offset-0 size, so the contract is engine-exact.
    *
    * @param granularity "day" or "week" (any Spark date_trunc unit whose
    *                    offsets divide evenly into days)
    * @param offsetDays  days per offset unit (1 for day, 7 for week)
    */
  def retention(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      granularity: String = "day",
      offsetDays: Int = 1): DataFrame = {
    require(offsetDays > 0)
    val firstSeen = events
      .groupBy(col(userCol))
      .agg(min(col(tsCol)).as("__first_ts"))
      .select(col(userCol), trunc(granularity, col("__first_ts")).as("cohort"))
    val active = events
      .select(col(userCol), trunc(granularity, col(tsCol)).as("__period"))
      .distinct()
    val counts = active
      .join(firstSeen, userCol)
      .groupBy(
        col("cohort"),
        (datediff(col("__period"), col("cohort")) / offsetDays).cast("long").as("offset"))
      // `active` is already one row per (user, period), so a plain count
      // IS the distinct-user count — no count-distinct shuffle state
      .agg(count(lit(1)).as("n_users"))
    // cohort size = offset-0 row by definition (a user is active in their
    // own first period); a window over the cohort's rows avoids a second
    // scan of the events
    val w = org.apache.spark.sql.expressions.Window.partitionBy("cohort")
    counts
      .withColumn("cohort_size", max(when(col("offset") === 0, col("n_users"))).over(w))
      // integer basis points (floor division) — engine-exact, no float
      // percentage to disagree on
      .withColumn("retention_bp", expr("(n_users * 10000) div cohort_size"))
  }

  /** RFM segmentation (Hughes 1994 — the classic recency/frequency/
    * monetary customer scoring): per user, days since last event, event
    * count, and monetary sum in cents, each labeled with its population
    * QUINTILE — segments like "5-5-5" (recent, frequent, high-value)
    * drive retention/curation targeting without any model.
    *
    * Quintiles come from [[Quantiles.percentileRanks]]' exact cume_dist
    * (q = ⌈5·cum_le/n⌉ ∈ 1..5 — derived from cum_le directly, NOT from
    * the floor-divided pct_bp, whose floor loss once made q = 0 possible
    * for near-unique metrics at n > 10000), so every label is
    * engine-exact; recency ranks over NEGATED days (recent = high pct =
    * quintile 5, aligning all three scales as higher-is-better). The
    * metric aggregation is one user-keyed pass; each quintile join is
    * histogram-grain (distinct metric values) and carries NO broadcast
    * hint — for a near-unique metric (m_cents) the rank relation is
    * user-grain, so a forced broadcast would OOM at exactly the scale
    * this targets; AQE still broadcasts when the relation is small. The
    * only hinted broadcast is the one-row population total.
    * Output: (user_id, r_days, f, m_cents, r_q, f_q, m_q).
    */
  def rfm(
      events: DataFrame,
      userCol: String,
      tsSecCol: String,
      centsCol: String,
      asOfSec: Long): DataFrame = {
    val m = events
      .groupBy(col(userCol))
      .agg(
        expr(s"($asOfSec - max($tsSecCol)) div 86400").as("r_days"),
        count(lit(1)).as("f"),
        sum(col(centsCol)).as("m_cents"))
      .withColumn("__negr", -col("r_days"))
    def quintile(valueCol: String, outCol: String)(df: DataFrame): DataFrame = {
      val pr = Quantiles.percentileRanks(m.withColumn("__g", lit(1)), "__g", valueCol)
      // population size as a broadcast singleton (n = max cum_le over the
      // single group) — the quintile needs exact n, which percentileRanks
      // does not ship
      val nRel = pr.agg(max("cum_le").as("__n"))
      val ranks = pr
        .crossJoin(broadcast(nRel))
        .select(
          col("value").as(valueCol),
          expr("CAST((5 * cum_le + __n - 1) div __n AS INT)").as(outCol))
      df.join(ranks, valueCol)
    }
    quintile("m_cents", "m_q")(quintile("f", "f_q")(quintile("__negr", "r_q")(m)))
      .select(col(userCol), col("r_days"), col("f"), col("m_cents"),
        col("r_q"), col("f_q"), col("m_q"))
  }
}
