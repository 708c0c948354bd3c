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
  * (Cauchy–Schwarz), so both replay bit-for-bit in any engine. Width is
  * a NAMED contract on the sums themselves — the binding width is the
  * squared-sum, not the row count (ten max-weight rows already push
  * Σw² = 10¹⁹ past BIGINT): Σw² stays DECIMAL(38,0) internally and
  * ships as a canonical digit STRING (the MannWhitney var12s idiom),
  * and the plan asserts by digit length that n ≤ 10¹²−1, Σw ≤ 10¹⁶−1,
  * and n·Σw² < 10³¹ so every ppm numerator fits DECIMAL(38,0) and both
  * ppm ratios fit BIGINT.
  *
  * Scale shape: ONE map-side-combinable aggregate per group. Nothing
  * else.
  *
  * Output, one row per group: (group…, n, w_sum, w_sq_sum, ess_ppm,
  * deff_ppm) — w_sq_sum a canonical digit STRING.
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
        sum(expr("CAST(w AS DECIMAL(38,0)) * w")).as("__wss"))
      // digit-length width contract, asserted by name: n ≤ 1e12−1 bounds
      // both ppm ratios in BIGINT; Σw ≤ 1e16−1 bounds 1e6·(Σw)² in
      // DECIMAL(38,0); digits(n)+digits(Σw²) ≤ 31 bounds 1e6·n·Σw²
      .withColumn("__ok",
        when(
          length(col("n").cast("string")) <= 12 &&
            length(col("w_sum").cast("string")) <= 16 &&
            length(col("n").cast("string")) +
              length(col("__wss").cast("string")) <= 31,
          lit(true))
          .otherwise(raise_error(concat(
            lit("EffectiveSampleSize width contract: need n < 1e12, " +
              "sum(w) < 1e16, n*sum(w^2) < 1e31; got n="),
            col("n").cast("string"), lit(" w_sum="),
            col("w_sum").cast("string"), lit(" w_sq_sum="),
            col("__wss").cast("string")))))
      .select(
        groupCols.map(col) ++ Seq(
          col("n"), col("w_sum"),
          when(col("__ok"), col("__wss").cast("string")).as("w_sq_sum"),
          when(col("__ok"), expr(
            """(1000000 * CAST(w_sum AS DECIMAL(38,0)) * w_sum)
              |div __wss""".stripMargin)).as("ess_ppm"),
          when(col("__ok"), expr(
            """(1000000 * CAST(n AS DECIMAL(38,0)) * __wss)
              |div (CAST(w_sum AS DECIMAL(38,0)) * w_sum)""".stripMargin))
            .as("deff_ppm")): _*)
  }
}
