package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Trimmed and winsorized means per group, exact — the robust location
  * estimates (Tukey 1962) for heavy-tailed metrics (revenue, latency)
  * where the plain mean follows the outliers: trim drops the `trimBp`/10⁴
  * fraction of rows from EACH tail; winsorize clamps them to the
  * surviving boundary values instead. The pair brackets the "real"
  * center, and trimmed ≠ winsorized ≠ mean is itself a tail-weight
  * diagnostic.
  *
  * Rank arithmetic happens on the VALUE-GRAIN histogram, never per row:
  * with per-group inclusive prefix counts cum(v) (before(v) = cum − cnt),
  * the rows of value v surviving a cut of c from each tail number
  * max(0, min(cum, n−c) − max(before, c)) — so the trimmed sum is one
  * conditional sum over the grain, and the winsorized sum adds
  * c·(L + U) with L = min v: cum > c, U = max v: before < n−c. Means
  * floor in ppm (`div`, engine-exact). A group whose interior empties
  * (n ≤ 2c) reports 0s rather than dividing by zero.
  *
  * Scale shape: one groupBy to (group, value) grain, per-GROUP windows
  * over that grain (partitioned — bounded by a group's distinct values,
  * no global window), one grain-grain aggregate per group. Products ride
  * DECIMAL(38,0) so 10¹²-row groups of 10⁶-scaled values stay exact.
  *
  * Output: (g, n, cut, trimmed_mean_ppm, winsor_mean_ppm, mean_ppm).
  */
object RobustMean {

  def trimmed(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      trimBp: Int): DataFrame = {
    require(trimBp >= 0 && trimBp < 5000,
      s"RobustMean.trimmed: trimBp must be in [0, 5000), got $trimBp")
    val grain = df
      .select(col(groupCol).cast("string").as("g"), col(valueCol).cast("long").as("v"))
      .groupBy("g", "v")
      .agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy("g").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val pre = grain
      .withColumn("cum", sum("cnt").over(w))
      .withColumn("before", col("cum") - col("cnt"))
    val tot = pre.groupBy("g").agg(max("cum").as("n"))
      .withColumn("cut", expr(s"(n * $trimBp) div 10000"))
    pre
      .join(tot, "g")
      .groupBy("g")
      .agg(
        max("n").as("n"),
        max("cut").as("cut"),
        sum(expr(
          """CAST(v AS DECIMAL(38,0))
            |  * greatest(0, least(cum, n - cut) - greatest(before, cut))"""
            .stripMargin)).as("tsum"),
        sum(expr("CAST(v AS DECIMAL(38,0)) * cnt")).as("fsum"),
        min(when(col("cum") > col("cut"), col("v"))).as("lo"),
        max(when(col("before") < col("n") - col("cut"), col("v"))).as("hi"))
      .select(
        col("g"),
        col("n"),
        col("cut"),
        expr(
          """CASE WHEN n - 2 * cut <= 0 THEN CAST(0 AS BIGINT)
            |ELSE (1000000 * tsum) div (n - 2 * cut) END""".stripMargin)
          .as("trimmed_mean_ppm"),
        expr(
          """CASE WHEN n - 2 * cut <= 0 THEN CAST(0 AS BIGINT)
            |ELSE (1000000 * (tsum + CAST(cut AS DECIMAL(38,0)) * (lo + hi)))
            |     div n END""".stripMargin).as("winsor_mean_ppm"),
        expr("(1000000 * fsum) div n").as("mean_ppm"))
  }
}
