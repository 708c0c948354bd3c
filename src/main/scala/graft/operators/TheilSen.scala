package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Theil–Sen robust trend estimation per key (Theil 1950, Sen 1968): the
  * MEDIAN of all pairwise slopes (y₂−y₁)/(x₂−x₁) over a key's points —
  * the standard outlier-proof alternative to least squares for "is this
  * source's daily volume trending down" questions, with a ~29 %
  * breakdown point where one bad day wrecks an OLS fit.
  *
  * Exactness: slopes stay RATIONALS (num, den>0) end to end. Ordering
  * uses the exact floor of num·10¹²/den — computed as
  * (a − pmod(a, den))/den in DECIMAL(38,0), which is integer-valued and
  * therefore exact at any decimal scale — and is collision-free for
  * distinct rationals whenever den ≤ 10⁶ (two distinct fractions with
  * denominators ≤ d differ by ≥ 1/d², so scaling by 10¹² ≥ d⁴ ≥ d²
  * separates their floors); a per-row assert names that contract. Equal
  * rationals tie-break by (num, den) so the selected representative is
  * deterministic. The median is the LOWER median (percentile_disc
  * convention), reported as the chosen pair's (num, den) plus
  * ⌊num·10⁶/den⌋ fixed point.
  *
  * Scale shape: one equi-join on the key producing the per-key pair set
  * (quadratic IN THE KEY under the bounded-points contract — the same
  * sessionization bound as [[EventPattern]], guarded by name via
  * [[HotKeyGuard]]) and per-key windows over those bounded pairs. Keys
  * are independent; the corpus-grain work is the initial aggregation the
  * CALLER does to produce (key, x, y) points — daily rollups at 100 TB
  * arrive here already day-grain.
  */
object TheilSen {

  /** Median slope per key over integer points (xCol, yCol). Keys need ≥ 2
    * distinct x values (others drop — no pair, no slope); duplicate x
    * within a key contribute vertical pairs that are skipped (den = 0
    * never forms). Contract: per-key points ≤ maxPointsPerKey (named
    * failure, not an OOM) and every x-span ≤ 10⁶ (per-row assert).
    * Output: (key, n_points, n_pairs, slope_num, slope_den, slope_ppm).
    */
  def medianSlope(
      df: DataFrame,
      keyCol: String,
      xCol: String,
      yCol: String,
      maxPointsPerKey: Long = 4096L): DataFrame = {
    val pts0 = df.select(
      col(keyCol).as("k"),
      col(xCol).cast("long").as("x"),
      col(yCol).cast("long").as("y"))
    val pts = HotKeyGuard(pts0, col("k"), maxPointsPerKey, "TheilSen.medianSlope")
    val nPts = pts.groupBy("k").agg(count(lit(1)).as("n_points"))
    val a = pts.select(col("k"), col("x").as("x1"), col("y").as("y1"))
    val b = pts.select(col("k"), col("x").as("x2"), col("y").as("y2"))
    val dec = "decimal(38,0)"
    val pairs = a
      .join(b, Seq("k"))
      .filter(col("x2") > col("x1"))
      .select(
        col("k"),
        (col("y2") - col("y1")).as("num"),
        (col("x2") - col("x1")).as("den"))
      // exact-ordering contract: den ≤ 10⁶ (assert_true is NULL on pass,
      // so the filter keeps every row while forcing the probe)
      .filter(assert_true(
        col("den") <= 1000000L,
        concat(lit("TheilSen.medianSlope: x-span contract (den <= 1e6) violated: "),
          col("den").cast("string"))).isNull)
      .withColumn("__a", expr(s"cast(num as $dec) * 1000000000000"))
      // floor(num·10¹²/den): subtract the positive mod, divide exactly
      .withColumn("__sk", expr(s"(__a - pmod(__a, cast(den as $dec))) / cast(den as $dec)"))
    val w = Window.partitionBy("k").orderBy(col("__sk"), col("num"), col("den"))
    val wAll = Window.partitionBy("k")
    pairs
      .withColumn("rn", row_number().over(w))
      .withColumn("n_pairs", count(lit(1)).over(wAll))
      .filter(col("rn") === expr("(n_pairs + 1) div 2"))
      .join(nPts, Seq("k"))
      .select(
        col("k"),
        col("n_points"),
        col("n_pairs"),
        col("num").as("slope_num"),
        col("den").as("slope_den"),
        expr(s"""cast((cast(num as $dec) * 1000000
                 - pmod(cast(num as $dec) * 1000000, cast(den as $dec)))
                 / cast(den as $dec) as long)""").as("slope_ppm"))
  }
}
