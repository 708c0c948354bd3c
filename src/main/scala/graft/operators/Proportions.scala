package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Two-proportion z-test from sufficient statistics, exact — the
  * conversion-rate A/B read: with x_a successes of n_a and x_b of n_b,
  * the pooled-variance z² statistic is the rational
  *   z² = (x_a·n_b − x_b·n_a)² · (n_a + n_b)
  *        / (n_a·n_b·x·(n_a + n_b − x)),   x = x_a + x_b,
  * reported floored in ppm (z²·10⁶ div …) next to the exact rates —
  * engine-exact where the textbook formula needs square roots and
  * floats (z² ≥ 3.84 ⇔ p < 0.05 two-sided, 6.63 ⇔ 0.01; consumers
  * compare against critical values of χ²₁ exactly). Degenerate pools
  * (x = 0 or x = n) report z² = 0.
  *
  * Scale shape: ONE map-side-combinable aggregation over the labeled
  * rows; moments ride DECIMAL(38,0). Width contract: the z² numerator
  * is ~n⁵·10⁶, so exactness holds to n ≈ 2·10⁶ units per test — beyond
  * that an A/B's significance is never in doubt anyway (test the rate
  * DIFFERENCE at ppm scale upstream). Rows outside the two group
  * labels are rejected by name ([[MannWhitney]]'s contract).
  *
  * Output: one row (n_a, n_b, x_a, x_b, rate_a_ppm, rate_b_ppm,
  * z2_ppm).
  */
object Proportions {

  def zTest(
      df: DataFrame,
      groupCol: String,
      successCol: String,
      aLabel: String,
      bLabel: String): DataFrame = {
    require(aLabel != bLabel, s"Proportions.zTest: labels must differ, got '$aLabel' twice")
    val d = df.select(
      when(col(groupCol).cast("string").isin(aLabel, bLabel),
        col(groupCol).cast("string"))
        .otherwise(raise_error(concat(
          lit(s"Proportions.zTest: group label must be '$aLabel' or '$bLabel', got "),
          col(groupCol).cast("string")))).as("g"),
      when(col(successCol).cast("int").isin(0, 1), col(successCol).cast("long"))
        .otherwise(raise_error(concat(
          lit("Proportions.zTest: success flag must be 0 or 1, got "),
          col(successCol).cast("string"))).cast("long")).as("y"))
    d.agg(
        sum(when(col("g") === aLabel, 1L).otherwise(0L)).cast("decimal(38,0)").as("na"),
        sum(when(col("g") =!= aLabel, 1L).otherwise(0L)).cast("decimal(38,0)").as("nb"),
        sum(when(col("g") === aLabel, col("y")).otherwise(0L))
          .cast("decimal(38,0)").as("xa"),
        sum(when(col("g") =!= aLabel, col("y")).otherwise(0L))
          .cast("decimal(38,0)").as("xb"))
      .select(
        col("na").cast("long").as("n_a"),
        col("nb").cast("long").as("n_b"),
        col("xa").cast("long").as("x_a"),
        col("xb").cast("long").as("x_b"),
        expr("CASE WHEN na = 0 THEN CAST(0 AS BIGINT) " +
          "ELSE (1000000 * xa) div na END").as("rate_a_ppm"),
        expr("CASE WHEN nb = 0 THEN CAST(0 AS BIGINT) " +
          "ELSE (1000000 * xb) div nb END").as("rate_b_ppm"),
        expr(
          """CASE WHEN na * nb * (xa + xb) * (na + nb - xa - xb) = 0
            |  THEN CAST(0 AS BIGINT)
            |ELSE (1000000 * (xa * nb - xb * na) * (xa * nb - xb * na) * (na + nb))
            |     div (na * nb * (xa + xb) * (na + nb - xa - xb)) END"""
            .stripMargin).as("z2_ppm"))
  }
}
