package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sample-ratio-mismatch (SRM) check — the first gate every experiment
  * platform runs before showing ANY metric (Fabijan et al. 2019: a
  * failed SRM invalidates the whole readout): did the arms receive
  * traffic in the configured ratio? Goodness-of-fit sibling of
  * [[ChiSquare.independence]] (expected counts come from the FIXED
  * design ratio c:d, not from marginals) and of [[Benford]] (whose
  * fixed table is the law, here the experiment config).
  *
  * Exact contract, ratio c:d = expectA:expectB, n = n_a + n_b:
  *   χ² = (n_a(c+d) − nc)²/((c+d)·nc) + (n_b(c+d) − nd)²/((c+d)·nd),
  * floored per term in ppm:
  *   term_g = (10⁶·(o_g·(c+d) − n·e_g)²) div ((c+d)·n·e_g)
  * with e_a = c, e_b = d — srm_ppm = term_a + term_b compares against
  * χ²₁ (3.84·10⁶ ⇔ p < 0.05; SRM practice alarms at p < 10⁻³,
  * 10.83·10⁶). No floats anywhere; rows outside the two labels are
  * rejected by name ([[DiffInDiff]] contract) — a typo'd arm must not
  * silently shift the ratio it is supposed to police.
  *
  * Scale shape: ONE map-side-combinable aggregate. Width: (o·(c+d))² ≤
  * (n·(c+d))² widens through DECIMAL(38,0) — safe for n·(c+d) < 10¹⁸.
  *
  * Output: one row (n_a, n_b, expect_a, expect_b, a_share_ppm,
  * expected_a_ppm, srm_ppm, srm_alarm) with srm_alarm = srm_ppm >
  * 10.83·10⁶ (the p < 10⁻³ practice bar).
  */
object SampleRatio {

  def check(
      df: DataFrame,
      armCol: String,
      aLabel: String,
      bLabel: String,
      expectA: Long = 1L,
      expectB: Long = 1L): DataFrame = {
    require(aLabel != bLabel, "SampleRatio.check: arm labels must differ")
    require(expectA >= 1 && expectB >= 1,
      s"SampleRatio.check: expected ratio parts must be >= 1: $expectA:$expectB")
    val d = df.select(
      when(col(armCol).cast("string").isin(aLabel, bLabel),
        col(armCol).cast("string"))
        .otherwise(raise_error(concat(
          lit(s"SampleRatio.check: arm must be '$aLabel' or '$bLabel', got "),
          col(armCol).cast("string")))).as("g"))
    val cd = expectA + expectB
    d.agg(
      coalesce(sum(when(col("g") === aLabel, 1L).otherwise(0L)), lit(0L)).as("n_a"),
      coalesce(sum(when(col("g") === bLabel, 1L).otherwise(0L)), lit(0L)).as("n_b"))
      .select(
        when(col("n_a") + col("n_b") === 0L,
          raise_error(lit("SampleRatio.check: no rows")).cast("long"))
          .otherwise(col("n_a")).as("n_a"),
        col("n_b"))
      .withColumn("expect_a", lit(expectA))
      .withColumn("expect_b", lit(expectB))
      .withColumn("a_share_ppm", expr("(1000000 * n_a) div (n_a + n_b)"))
      .withColumn("expected_a_ppm", lit(1000000L * expectA / cd))
      .withColumn("srm_ppm", expr(
        s"""(1000000 * (CAST(n_a AS DECIMAL(38,0)) * ${cd}L - (n_a + n_b) * ${expectA}L)
           |          * (CAST(n_a AS DECIMAL(38,0)) * ${cd}L - (n_a + n_b) * ${expectA}L))
           |div (${cd}L * CAST(n_a + n_b AS DECIMAL(38,0)) * ${expectA}L)
           |+ (1000000 * (CAST(n_b AS DECIMAL(38,0)) * ${cd}L - (n_a + n_b) * ${expectB}L)
           |          * (CAST(n_b AS DECIMAL(38,0)) * ${cd}L - (n_a + n_b) * ${expectB}L))
           |div (${cd}L * CAST(n_a + n_b AS DECIMAL(38,0)) * ${expectB}L)""".stripMargin))
      .withColumn("srm_alarm", col("srm_ppm") > 10830000L)
  }
}
