package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Covariate balance check — the randomization-health gate every
  * experiment readout should run FIRST (Imbens & Rubin 2015: |SMD| <
  * 0.1 is the conventional bar): is a pre-treatment covariate
  * distributed alike across the two arms? A failed balance check means
  * the assignment was broken (or the covariate leaked) and every
  * downstream estimate ([[Cuped]], [[DiffInDiff]], [[Proportions]]) is
  * suspect. The squared standardized mean difference ships exactly, so
  * no sqrt/float enters:
  *
  *   mean_ppm_g = (10⁶·Σx_g) div n_g          (per-arm floors)
  *   var_g     = (n_g·Σx²_g − (Σx_g)²) div n_g²   (population variance,
  *                                              floored — DEFINED here)
  *   smd2_ppm  = (2·Δppm²) div (10⁶·(var_a + var_b))
  *
  * with Δppm = mean_ppm_a − mean_ppm_b; smd² < 0.01 (the |SMD| < 0.1
  * bar) ⇔ smd2_ppm < 10⁴. The unbounded case is decided on the EXACT
  * variance numerators (n_a·Σx²_a − (Σx_a)² + n_b·Σx²_b − (Σx_b)² = 0
  * ⇔ both arms truly constant — each term ≥ 0 by Cauchy–Schwarz), not
  * on the floored var columns: truly-constant arms report smd2_ppm = 0
  * when the floored means agree and fail BY NAME when they differ (an
  * infinite SMD must not ship as a silent 0), while arms whose small
  * but genuinely nonzero variance merely FLOORS to 0 (e.g. counts
  * {0,0,1}: true var 2/9) fail with a distinct by-name error telling
  * the caller to scale x upstream — the floored statistic cannot
  * represent that readout, and a silent 0-denominator division must
  * not decide it. Values must be integral (quantize upstream); rows
  * outside the two arm labels are rejected by name (the [[DiffInDiff]]
  * contract).
  *
  * Scale shape: ONE map-side-combinable aggregate per arm — sufficient
  * statistics only. Width: sums widen to DECIMAL(38,0) before squaring;
  * Δppm² ≤ 10¹²·max(x)² stays in range for |x| ≤ 10¹².
  *
  * Output: one row (n_a, n_b, mean_a_ppm, mean_b_ppm, var_a, var_b,
  * smd2_ppm, balanced) with balanced = smd2_ppm < 10⁴.
  */
object Balance {

  def smd(
      df: DataFrame,
      armCol: String,
      xCol: String,
      aLabel: String,
      bLabel: String): DataFrame = {
    require(aLabel != bLabel, "Balance.smd: arm labels must differ")
    val d = df.select(
      when(col(armCol).cast("string").isin(aLabel, bLabel),
        col(armCol).cast("string"))
        .otherwise(raise_error(concat(
          lit(s"Balance.smd: arm must be '$aLabel' or '$bLabel', got "),
          col(armCol).cast("string")))).as("g"),
      col(xCol).cast("long").as("x"))
    def arm(label: String, sfx: String) = d.filter(col("g") === label)
      .agg(
        count(lit(1)).as(s"n_$sfx"),
        coalesce(sum("x"), lit(0L)).cast("decimal(38,0)").as(s"s_$sfx"),
        coalesce(sum(expr("CAST(x AS DECIMAL(38,0)) * x")),
          lit(0).cast("decimal(38,0)")).as(s"q_$sfx"))
    val stats = arm(aLabel, "a").crossJoin(arm(bLabel, "b"))
      .select(
        when(col("n_a") === 0 || col("n_b") === 0,
          raise_error(lit(
            s"Balance.smd: both arms must be non-empty " +
              s"('$aLabel' and '$bLabel')")).cast("long"))
          .otherwise(col("n_a")).as("n_a"),
        col("n_b"), col("s_a"), col("s_b"), col("q_a"), col("q_b"))
      .withColumn("mean_a_ppm", expr("(1000000 * s_a) div n_a"))
      .withColumn("mean_b_ppm", expr("(1000000 * s_b) div n_b"))
      .withColumn("var_a",
        expr("(n_a * q_a - s_a * s_a) div (CAST(n_a AS DECIMAL(38,0)) * n_a)"))
      .withColumn("var_b",
        expr("(n_b * q_b - s_b * s_b) div (CAST(n_b AS DECIMAL(38,0)) * n_b)"))
    stats
      .select(
        col("n_a"), col("n_b"), col("mean_a_ppm"), col("mean_b_ppm"),
        col("var_a"), col("var_b"),
        expr(
          """CASE
            |WHEN n_a * q_a - s_a * s_a + n_b * q_b - s_b * s_b = 0
            |     AND mean_a_ppm = mean_b_ppm THEN 0L
            |WHEN n_a * q_a - s_a * s_a + n_b * q_b - s_b * s_b = 0
            |THEN CAST(raise_error(
            |  'Balance.smd: zero variance in both arms with unequal means - SMD is unbounded') AS BIGINT)
            |WHEN var_a + var_b = 0 THEN CAST(raise_error(
            |  'Balance.smd: nonzero variance floors to 0 in both arms - scale x upstream before the SMD floor') AS BIGINT)
            |ELSE (2 * CAST(mean_a_ppm - mean_b_ppm AS DECIMAL(38,0))
            |        * (mean_a_ppm - mean_b_ppm))
            |     div (1000000 * (CAST(var_a AS DECIMAL(38,0)) + var_b))
            |END""".stripMargin).as("smd2_ppm"))
      .withColumn("balanced", col("smd2_ppm") < 10000L)
  }
}
