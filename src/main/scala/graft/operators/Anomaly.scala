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
}
