package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** EXACT distributed quantiles over a low-cardinality value domain (token
  * counts, document lengths, label ids — the corpus-statistics columns),
  * computed the scale-correct way: histogram first, rank second.
  *
  * A row-level sort-and-rank (`row_number` over each group) funnels every
  * row of a group through one partition — unusable when a group is a whole
  * corpus. Instead: `groupBy(group, value).count()` map-side combines to
  * one row per distinct value (the histogram, ≤ |domain| rows per group),
  * and the quantile is read off the histogram's running sum. The ONLY
  * data-sized work is the partial-aggregated count; the window runs over
  * histogram rows. `approx_percentile` trades exactness for one pass at
  * unbounded domains; on bounded domains this is exact AND one pass.
  *
  * Quantile contract (percentile_disc): q-quantile = the smallest value v
  * whose cumulative count reaches ceil(q·n), with q given as num/den so
  * the rank threshold is exact integer math.
  */
object Quantiles {

  /** Output: (group, n, q_<name> per requested quantile), all integers.
    * `qs` entries are (colName, num, den) — e.g. ("p50", 1, 2).
    */
  def exactQuantiles(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      qs: Seq[(String, Long, Long)]): DataFrame = {
    require(qs.nonEmpty, "exactQuantiles: need at least one quantile")
    qs.foreach { case (n, num, den) =>
      require(num > 0 && den > 0 && num <= den, s"exactQuantiles: bad quantile $n=$num/$den")
    }
    val hist = df
      .groupBy(col(groupCol), col(valueCol).as("__v"))
      .agg(count(lit(1)).as("__c"))
    val w = Window.partitionBy(groupCol).orderBy("__v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(groupCol)
    val ranked = hist
      .withColumn("__cum", sum("__c").over(w))
      .withColumn("__n", sum("__c").over(wAll))
    val aggs = qs.map { case (name, num, den) =>
      min(when(col("__cum") >= expr(s"(${num}L * __n + ${den}L - 1L) div ${den}L"), col("__v")))
        .as(name)
    }
    ranked
      .groupBy(groupCol)
      .agg(first(col("__n")).as("n"), aggs: _*)
  }

  /** Per-group PERCENTILE RANKS of every distinct value — quantile
    * normalization, the cross-source score alignment trick (a "0.82
    * quality" from one scorer and a "6.1" from another only compare
    * through their within-source ranks; cf. rank-based normalization in
    * ensemble retrieval and microarray quantile normalization).
    *
    * Scale shape: one histogram aggregation (map-side combined, ≤ |group
    * × domain| rows), then the recursive [[PrefixSum]] over a composite
    * key (groupIndex · 2^41 + shifted value — monotone within a group, so
    * in-group order is key order) with per-group offsets subtracted back
    * out; every window anywhere sees ≤ blockSize or ≤ |groups| rows. A
    * plain `cume_dist` window would funnel each group's whole histogram
    * (fine) but the JOIN BACK to rows is never needed — consumers join on
    * (group, value).
    *
    * Output: (group, value, n_rows, cum_le, pct_bp) with pct_bp =
    * (10000·cum_le) div n — the cume_dist of the value in exact basis
    * points. Values must be longs; group × value domains must be far
    * below data size (the histogram contract).
    */
  def percentileRanks(
      df: DataFrame,
      groupCol: String,
      valueCol: String): DataFrame = {
    val h = df.groupBy(col(groupCol), col(valueCol).as("__v"))
      .agg(count(lit(1)).as("__c"))
      .persist()
    val bounds = h.agg(min("__v").as("mn"), max("__v").as("mx")).head()
    require(!bounds.isNullAt(0), "percentileRanks: empty input")
    val minV = bounds.getLong(0)
    require(
      bounds.getLong(1) - minV < (1L << 41),
      s"value span too wide for the composite key: ${bounds.getLong(1) - minV}")
    // deterministic group index + per-group start offset (both windows
    // run over the GROUP relation — bounded by the group count)
    val gw = Window.orderBy(groupCol)
    val groups = h.groupBy(groupCol).agg(sum("__c").as("__n"))
      .withColumn("__gi", row_number().over(gw).cast("long") - 1)
      .withColumn(
        "__off",
        coalesce(
          sum("__n").over(gw.rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
    val keyed = h.join(broadcast(groups), groupCol)
      .withColumn("k", col("__gi") * (1L << 41) + (col("__v") - lit(minV)))
    val before = PrefixSum.exclusive(keyed.select(col("k"), col("__c").as("s")))
    keyed
      .join(before, "k")
      .select(
        col(groupCol),
        col("__v").as("value"),
        col("__c").as("n_rows"),
        (col("before") - col("__off") + col("__c")).as("cum_le"),
        expr("((before - __off + __c) * 10000) div __n").as("pct_bp"))
  }
}
