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
}
