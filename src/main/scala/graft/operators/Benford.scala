package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benford first-digit audit — the classic fabricated-data detector
  * (Newcomb 1881, Benford 1938; the accounting-forensics standard):
  * naturally occurring multi-scale positive quantities have first
  * significant digit d with probability log₁₀(1 + 1/d), and invented or
  * truncated numbers don't. A χ²-shaped per-digit score names which
  * digits deviate — the data-quality tripwire for price/amount/count
  * columns arriving from an untrusted pipeline.
  *
  * Exact-integer contract: the expected shares are FIXED ppm constants
  * (⌊10⁶·log₁₀(1+1/d)⌋ with the remainder assigned to digit 1 so they
  * sum to exactly 10⁶ — part of the operator's definition, documented
  * here rather than recomputed via any engine's log):
  *   d=1: 301034, 2: 176091, 3: 124938, 4: 96910, 5: 79181,
  *   d=6: 66946, 7: 57991, 8: 51152, 9: 45757  (Σ = 10⁶; the floors
  *   sum to 999995, so digit 1 carries the +5 remainder).
  * First digits extract by STRING head of the positive long (engine-
  * identical, no log/pow float path); zero and negative values are
  * rejected by name (Benford is defined on positive quantities — filter
  * or shift upstream). Per-digit score:
  *   contrib_ppm(d) = ((10⁶·o_d − n·e_ppm(d))²) div (n·e_ppm(d))
  * — the χ² at ppm scale; Σ is the audit statistic vs χ²₈ critical
  * values (15.5·10⁶ ⇔ p < 0.05). Digits absent from the data still
  * report (o = 0) — absence of 1s IS the signal.
  *
  * Scale shape: one map-side-combinable groupBy over 9 buckets, one
  * 9-row broadcast of the expected table. Width: (10⁶·o)² ≤ 10¹²·n² —
  * DECIMAL(38,0)-safe to n = 10¹³.
  *
  * Output, d ascending 1..9: (d, o, expected_ppm, observed_ppm,
  * contrib_ppm, chi2_ppm) — scalar repeated per row (the
  * [[Concentration]] idiom).
  */
object Benford {

  /** (digit, ppm) — floors of 10⁶·log₁₀(1+1/d), remainder on digit 1. */
  val ExpectedPpm: Seq[(Int, Long)] = Seq(
    1 -> 301034L, 2 -> 176091L, 3 -> 124938L, 4 -> 96910L, 5 -> 79181L,
    6 -> 66946L, 7 -> 57991L, 8 -> 51152L, 9 -> 45757L)
  require(ExpectedPpm.map(_._2).sum == 1000000L)

  def firstDigit(df: DataFrame, valueCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val d = df.select(
      when(col(valueCol).cast("long") >= 1L,
        substring(col(valueCol).cast("long").cast("string"), 1, 1).cast("int"))
        .otherwise(raise_error(concat(
          lit("Benford.firstDigit: values must be >= 1, got "),
          col(valueCol).cast("string"))).cast("int")).as("d"))
    val obs = d.groupBy("d").agg(count(lit(1)).as("o"))
    val nRow = obs.agg(coalesce(sum("o"), lit(0L))).head()
    val n = nRow.getLong(0)
    require(n > 0, "Benford.firstDigit: no rows")
    val expected = ExpectedPpm.toDF("d", "expected_ppm")
    // obs is the build side: left-outer only supports build-right, and
    // the digit histogram is ≤ 9 rows anyway
    val cells = expected.join(broadcast(obs), Seq("d"), "left")
      .select(
        col("d"), coalesce(col("o"), lit(0L)).as("o"), col("expected_ppm"),
        expr(s"(1000000 * coalesce(o, 0L)) div ${n}L").as("observed_ppm"),
        expr(
          s"""((1000000 * CAST(coalesce(o, 0L) AS DECIMAL(38,0)) - ${n}L * expected_ppm)
             | * (1000000 * CAST(coalesce(o, 0L) AS DECIMAL(38,0)) - ${n}L * expected_ppm))
             |div (CAST(${n}L AS DECIMAL(38,0)) * expected_ppm)""".stripMargin)
          .as("contrib_ppm"))
    val tot = cells.agg(sum("contrib_ppm").cast("long").as("chi2_ppm"))
    cells.crossJoin(broadcast(tot))
      .select("d", "o", "expected_ppm", "observed_ppm", "contrib_ppm", "chi2_ppm")
  }
}
