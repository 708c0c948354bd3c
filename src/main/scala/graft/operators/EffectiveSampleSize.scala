package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Kish effective sample size and design effect of a weighted sample —
  * the one-number health check every weighted estimator needs BEFORE
  * anyone trusts it (Kish 1965): ESS = (Σw)²/Σw² is how many unweighted
  * rows the weighted sample is actually worth, and deff = n·Σw²/(Σw)² is
  * the variance inflation the weighting costs. The natural companion to
  * the sampling tier ([[Sampling.ppsSystematic]], [[PrioritySample]],
  * q80's DSIR resample): a mixture whose importance weights collapse ESS
  * to a few hundred is broken no matter how many rows it has.
  *
  * Exact-integer contract: weights are asserted integral positive (the
  * [[PrioritySample]] [1, 10⁹] convention), sums widen to DECIMAL(38,0)
  * before squaring, and both ratios floor in ppm:
  *   ess_ppm  = (10⁶·(Σw)²) div (Σw²)   — ESS at ppm scale,
  *   deff_ppm = (10⁶·n·Σw²) div ((Σw)²) — ≥ 10⁶, = 10⁶ iff equal weights
  * (Cauchy–Schwarz), so both replay bit-for-bit in any engine. Width:
  * (Σw)² ≤ (n·10⁹)² needs n ≲ 10¹⁰ — asserted nowhere because BIGINT
  * counts already bound it.
  *
  * Scale shape: ONE map-side-combinable aggregate per group. Nothing
  * else.
  *
  * Output, one row per group: (group…, n, w_sum, w_sq_sum, ess_ppm,
  * deff_ppm).
  */
object EffectiveSampleSize {

  def perGroup(df: DataFrame, groupCols: Seq[String], wCol: String): DataFrame = {
    val d = df.select(
      groupCols.map(col) :+
        when(col(wCol).cast("long") >= 1L && col(wCol).cast("long") <= 1000000000L,
          col(wCol).cast("long"))
          .otherwise(raise_error(concat(
            lit("EffectiveSampleSize: weight contract (1 <= w <= 1e9) violated: "),
            col(wCol).cast("string"))).cast("long")).as("w"): _*)
    d.groupBy(groupCols.map(col): _*)
      .agg(
        count(lit(1)).as("n"),
        sum("w").as("w_sum"),
        sum(expr("CAST(w AS DECIMAL(38,0)) * w")).cast("long").as("w_sq_sum"))
      .select(
        groupCols.map(col) ++ Seq(
          col("n"), col("w_sum"), col("w_sq_sum"),
          expr(
            """(1000000 * CAST(w_sum AS DECIMAL(38,0)) * w_sum)
              |div w_sq_sum""".stripMargin).as("ess_ppm"),
          expr(
            """(1000000 * CAST(n AS DECIMAL(38,0)) * w_sq_sum)
              |div (CAST(w_sum AS DECIMAL(38,0)) * w_sum)""".stripMargin)
            .as("deff_ppm")): _*)
  }
}
