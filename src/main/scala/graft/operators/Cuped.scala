package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** CUPED variance reduction (Controlled-experiment Using Pre-Experiment
  * Data; Deng, Xu, Kohavi & Walker, WSDM 2013): adjust an experiment
  * metric y by its pre-period covariate x — ŷ = y − θ(x − x̄) with
  * θ = Cov(x, y)/Var(x) fitted on the POOLED population (x is
  * pre-treatment, so pooling is unbiased) — shrinking the metric's
  * variance by the squared correlation without moving arm means.
  *
  * Everything derives from sufficient statistics in exact integers, and
  * every division is a SINGLE truncating division whose quotient is
  * ppm/bp-sized (Spark `div` ≡ DuckDB `//`, both toward zero), so the
  * output is engine-exact:
  *   theta_ppm     = (10⁶·(n·Σxy − Σx·Σy)) div (n·Σxx − (Σx)²)
  *   mean_y_ppm    = (10⁶·Σy_a) div n_a
  *   mean_ycup_ppm = mean_y_ppm − (θ_ppm·(n·Σx_a − n_a·Σx)) div (n_a·n)
  *   varred_bp     = (10⁴·(2·θ_ppm·c_a·10⁶ − θ_ppm²·vx_a))
  *                     div (vy_a·10¹²)
  * with per-arm centered moments c_a = n_a·Σxy_a − Σx_a·Σy_a,
  * vx_a = n_a·Σxx_a − (Σx_a)², vy_a = n_a·Σyy_a − (Σy_a)² — the
  * Var(ŷ) = Var(y) − 2θCov + θ²Var(x) identity read as a reduction
  * fraction. Var(x) = 0 ⇒ θ = 0; vy_a = 0 ⇒ varred_bp = 0.
  *
  * Scale shape: TWO map-side-combinable aggregations (one per arm, one
  * global single row the arm grain broadcast-cross-joins) — no second
  * pass over units, no per-unit adjusted column ever materializes.
  * Moment products ride in DECIMAL(38,0); width contract:
  * n·Σ|xy|·10¹⁰ < 10³⁸ (comfortably 10¹² units of 10⁶-scaled metrics).
  *
  * Input grain: one row per experimental unit (armCol, xCol, yCol),
  * x/y integral. Output: (arm, n, theta_ppm, mean_y_ppm,
  * mean_ycup_ppm, varred_bp), one row per arm.
  */
object Cuped {

  def adjust(df: DataFrame, armCol: String, xCol: String, yCol: String): DataFrame = {
    val dec = "decimal(38,0)"
    val d = df.select(
      col(armCol).cast("string").as("arm"),
      col(xCol).cast("long").cast(dec).as("x"),
      col(yCol).cast("long").cast(dec).as("y"))
    val global = d.agg(
      count(lit(1)).cast(dec).as("n"),
      sum("x").as("sx"),
      sum("y").as("sy"),
      sum(col("x") * col("x")).as("sxx"),
      sum(col("x") * col("y")).as("sxy"))
    val perArm = d.groupBy("arm").agg(
      count(lit(1)).cast(dec).as("na"),
      sum("x").as("sxa"),
      sum("y").as("sya"),
      sum(col("x") * col("x")).as("sxxa"),
      sum(col("x") * col("y")).as("sxya"),
      sum(col("y") * col("y")).as("syya"))
    perArm
      .crossJoin(broadcast(global))
      .withColumn("theta_ppm", expr(
        """CASE WHEN n * sxx - sx * sx = 0 THEN CAST(0 AS BIGINT)
          |ELSE (1000000 * (n * sxy - sx * sy)) div (n * sxx - sx * sx) END"""
          .stripMargin))
      .withColumn("ca", expr("na * sxya - sxa * sya"))
      .withColumn("vxa", expr("na * sxxa - sxa * sxa"))
      .withColumn("vya", expr("na * syya - sya * sya"))
      .select(
        col("arm"),
        col("na").cast("long").as("n"),
        col("theta_ppm"),
        expr("(1000000 * sya) div na").as("mean_y_ppm"),
        expr(
          """(1000000 * sya) div na
            |  - (CAST(theta_ppm AS DECIMAL(38,0)) * (n * sxa - na * sx))
            |      div (na * n)""".stripMargin).as("mean_ycup_ppm"),
        expr(
          """CASE WHEN vya = 0 THEN CAST(0 AS BIGINT)
            |ELSE (10000 * (CAST(2 AS DECIMAL(38,0)) * theta_ppm * ca * 1000000
            |               - CAST(theta_ppm AS DECIMAL(38,0)) * theta_ppm * vxa))
            |     div (vya * 1000000000000) END""".stripMargin).as("varred_bp"))
  }
}
