package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Robust per-group outlier detection: flag values more than k MADs from
  * their group median — the monitoring pass a pipeline runs over metric
  * streams where mean/stddev break on the very outliers being hunted
  * (both are dragged by the tail; median/MAD have a 50% breakdown point).
  *
  * All decisions are exact integer comparisons: the caller supplies an
  * integer value column (scale fixed-point inputs first — cents,
  * microseconds, token counts), medians come from the histogram-first
  * [[Quantiles.exactQuantiles]] (percentile_disc contract), and the flag
  * is `|v − med| > k·mad` in longs — no float anywhere, so the whole
  * operator replays exactly in SQL.
  *
  * Scale shape: two quantile passes (each a map-side-combined histogram —
  * the only data-sized aggregations) plus two joins against ≤ |groups|-row
  * relations; the deviation column is a projection, never materialized
  * state.
  */
object Anomaly {

  /** Flagged rows: all input columns + (med, mad, dev). */
  def madOutliers(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      k: Long): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    val med = Quantiles
      .exactQuantiles(df, groupCol, valueCol, Seq(("med", 1L, 2L)))
      .select(col(groupCol), col("med"))
    val dev = df
      .join(med, groupCol)
      .withColumn("dev", abs(col(valueCol) - col("med")))
    val mad = Quantiles
      .exactQuantiles(dev, groupCol, "dev", Seq(("mad", 1L, 2L)))
      .select(col(groupCol), col("mad"))
    dev
      .join(mad, groupCol)
      .filter(col("dev") > lit(k) * col("mad"))
  }

  /** Tukey IQR fences — the boxplot rule, the OTHER classic robust
    * flag next to [[madOutliers]] (a reviewer expects both; they
    * disagree exactly on skewed tails, which is the point of offering
    * two). Per group: Q1 and Q3 from [[Quantiles.exactQuantiles]]
    * (percentile_disc contract), fence factor k = kNum/kDen (default
    * 3/2), flag = v < Q1 − k·IQR or v > Q3 + k·IQR — compared as
    * `kDen·v` vs `kDen·Q1 − kNum·IQR` so the decision is pure longs
    * whatever the factor. One histogram aggregation + one ≤ |groups|
    * join; same replay-exact contract as the MAD flag.
    * Output: flagged rows + (q1, q3, lo_fence_num, hi_fence_num) with
    * the fences carried ×kDen (exact, avoids a division).
    */
  def iqrOutliers(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      kNum: Long = 3L,
      kDen: Long = 2L): DataFrame = {
    require(kNum >= 0 && kDen >= 1, s"bad fence factor $kNum/$kDen")
    val q = Quantiles
      .exactQuantiles(df, groupCol, valueCol, Seq(("q1", 1L, 4L), ("q3", 3L, 4L)))
      .select(
        col(groupCol), col("q1"), col("q3"),
        (lit(kDen) * col("q1") - lit(kNum) * (col("q3") - col("q1")))
          .as("lo_fence_num"),
        (lit(kDen) * col("q3") + lit(kNum) * (col("q3") - col("q1")))
          .as("hi_fence_num"))
    df.join(q, groupCol)
      .filter(
        lit(kDen) * col(valueCol) < col("lo_fence_num") ||
          lit(kDen) * col(valueCol) > col("hi_fence_num"))
  }
}
