package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Kaplan–Meier survival curves in exact integer ppm — the
  * right-censored "how long do subjects last" table (user retention,
  * document shelf-life, hardware lifetimes) that classical aggregates
  * cannot express: censored subjects (event flag 0) leave the risk set
  * without counting as events, which a plain groupBy over-counts.
  *
  * Estimator (Kaplan & Meier 1958): at each distinct observed-EVENT
  * time t_k (ascending), with n_k subjects at risk (duration ≥ t_k) and
  * d_k events at t_k, S(t_k) = Π_{i≤k} (n_i − d_i)/n_i. The product is
  * kept engine-exact by flooring in ppm at every step:
  * s_ppm(k) = ⌊s_ppm(k−1)·(n_k − d_k) / n_k⌋, s_ppm(0) = 10⁶ — the
  * floor order is the time order, so the value is deterministic in any
  * engine and replayable by a recursive SQL CTE.
  *
  * Scale shape: one groupBy to (group, duration) grain, one per-group
  * window over that GRAIN (distinct durations, not subjects) for the
  * risk-set suffix sum, then the event-time steps collect into a sorted
  * per-group array folded by one `aggregate` HOF — state is
  * #event-times per group, the curve itself, which is also the output;
  * `maxStepsPerGroup` names the contract ([[HotKeyGuard]]) instead of
  * letting a degenerate continuous-time group OOM a task. The running
  * product stays in longs: s_ppm ≤ 10⁶, so s_ppm·(n−d) needs n < 2⁵⁷.
  *
  * Output: (g, t, n_risk, n_events, s_ppm), one row per observed-event
  * time per group, ascending t.
  */
object Survival {

  /** `df` columns: `groupCol` (curve key), `durationCol` (integer
    * duration ≥ 0), `eventCol` (1 = event observed, 0 = right-censored).
    */
  def kaplanMeier(
      df: DataFrame,
      groupCol: String,
      durationCol: String,
      eventCol: String,
      maxStepsPerGroup: Long = Long.MaxValue): DataFrame = {
    val subj = df.select(
      col(groupCol).as("g"),
      when(col(durationCol).cast("long") < 0,
        raise_error(concat(
          lit("Survival.kaplanMeier: durations must be >= 0, got "),
          col(durationCol).cast("string"))).cast("long"))
        .otherwise(col(durationCol).cast("long")).as("t"),
      when(col(eventCol).cast("int").isin(0, 1), col(eventCol).cast("int"))
        .otherwise(raise_error(concat(
          lit("Survival.kaplanMeier: event flag must be 0 or 1, got "),
          col(eventCol).cast("string"))).cast("int")).as("e"))
    val grain = subj.groupBy("g", "t").agg(
      sum("e").cast("long").as("d"),
      count(lit(1)).as("n_all"))
    // at risk at t = subjects with duration >= t: suffix sum over the grain
    val risk = grain.withColumn(
      "n", sum("n_all").over(Window.partitionBy("g").orderBy(col("t").desc)))
    val steps0 = risk.filter(col("d") > 0).select("g", "t", "n", "d")
    val steps = HotKeyGuard(steps0, col("g"), maxStepsPerGroup, "Survival.kaplanMeier")
    steps
      .groupBy("g")
      .agg(sort_array(collect_list(struct(col("t"), col("n"), col("d")))).as("steps"))
      .withColumn("s", expr(
        """slice(
          |  aggregate(steps, array(CAST(1000000 AS BIGINT)),
          |    (acc, x) -> concat(acc, array((element_at(acc, -1) * (x.n - x.d)) div x.n))),
          |  2, size(steps))""".stripMargin))
      .select(col("g"), explode(arrays_zip(col("steps"), col("s"))).as("z"))
      .select(
        col("g"),
        col("z.steps.t").as("t"),
        col("z.steps.n").as("n_risk"),
        col("z.steps.d").as("n_events"),
        col("z.s").as("s_ppm"))
  }
}
