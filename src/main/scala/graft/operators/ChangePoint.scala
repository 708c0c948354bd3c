package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One-sided CUSUM change-point detection (Page 1954) over a bucketed
  * series — "when did the level shift up?" for daily volumes, error
  * rates, ingestion counts. The classic recursion
  * S_t = max(0, S_{t−1} + x_t − ref) looks inherently sequential; the
  * identity that distributes it is S_t = P_t − min(0, min_{j≤t} P_j)
  * with P the running sum of the drifts (x − ref) — a prefix SUM and a
  * prefix MIN, both block-recursive [[PrefixSum]] scans, never a
  * data-sized global window. Integer-exact throughout, so the alarm
  * rows are engine-exact.
  *
  * Scale shape: one groupBy to bucket grain (the series IS the
  * histogram), [[PrefixSum.exclusive]] + [[PrefixSum.exclusiveMin]]
  * over that grain, two grain-sized joins, and (mean-ref form) one
  * broadcast single-row stats join. Cost is the bucket count.
  *
  * Output: (t, x, cusum, alarm) per bucket ascending — x the bucket's
  * summed value, alarm = cusum > h.
  */
object ChangePoint {

  /** Explicit reference level `ref` (CUSUM's tolerated drift k) and
    * absolute alarm threshold `h`.
    */
  def cusum(
      df: DataFrame,
      bucketCol: String,
      valueCol: String,
      ref: Long,
      h: Long): DataFrame = {
    require(h >= 0, s"ChangePoint.cusum: h must be >= 0, got $h")
    scan(grain(df, bucketCol, valueCol)
      .withColumn("ref", lit(ref))
      .withColumn("h", lit(h)))
  }

  /** Self-calibrating form: ref = ⌊Σx / #buckets⌋ (the series' own mean
    * level, one broadcast scalar) and h = (hNum·ref) div hDen — a
    * threshold RELATIVE to the level, so the same call works at any
    * data scale. Exact-integer and replayable like the explicit form.
    */
  def cusumMeanRef(
      df: DataFrame,
      bucketCol: String,
      valueCol: String,
      hNum: Long,
      hDen: Long): DataFrame = {
    require(hNum >= 0 && hDen > 0,
      s"ChangePoint.cusumMeanRef: need hNum >= 0, hDen > 0; got $hNum/$hDen")
    val g = grain(df, bucketCol, valueCol)
    val stats = g.agg(expr("sum(x) div count(1)").as("ref"))
      .withColumn("h", expr(s"($hNum * ref) div $hDen"))
    scan(g.crossJoin(broadcast(stats)))
  }

  private def grain(df: DataFrame, bucketCol: String, valueCol: String): DataFrame =
    df.select(
      when(col(bucketCol).cast("long") < 0,
        raise_error(concat(
          lit("ChangePoint.cusum: bucket keys must be >= 0, got "),
          col(bucketCol).cast("string"))).cast("long"))
        .otherwise(col(bucketCol).cast("long")).as("k"),
      col(valueCol).cast("long").as("x"))
      .groupBy("k")
      .agg(sum("x").as("x"))

  private def scan(g0: DataFrame): DataFrame = {
    val g = g0.withColumn("s", col("x") - col("ref"))
    val before = PrefixSum.exclusive(g.select("k", "s"))
    val p = g.join(before, "k")
      .select(col("k"), col("x"), col("h"), (col("before") + col("s")).as("p"))
    val minBefore = PrefixSum.exclusiveMin(p.select(col("k"), col("p").as("s")))
    p.join(minBefore, "k")
      .select(
        col("k").as("t"),
        col("x"),
        (col("p") - least(lit(0L), col("p"), col("min_before"))).as("cusum"),
        col("h"))
      .withColumn("alarm", col("cusum") > col("h"))
      .drop("h")
  }
}
