package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Zone maps (per-bucket min/max statistics) as an explicit relational
  * operator — the data-skipping layer a lakehouse keeps in file footers /
  * manifest files, materialized so the engine can prune buckets BEFORE
  * touching data. Pairs with [[graft.functions.InterleaveBits]]: z-order
  * the layout, bucket by z ranges, and the per-bucket min/max of EVERY
  * interleaved dimension stays narrow, so a predicate on any of them
  * skips most buckets.
  *
  * The pruning contract mirrors the Bloom pattern: candidate selection
  * can only OVER-approximate (a bucket whose [min,max] overlaps the
  * predicate range), the exact predicate re-applies after the skip, so
  * results are bit-identical to the unpruned filter — which is why the
  * pruned query oracles as the plain filter SQL.
  *
  * Scale shape: stats are one map-side-combined groupBy(bucket) pass —
  * ≤ buckets rows; candidate buckets collect driver-side (bounded by the
  * bucket count, never data-sized) and push back as an `isin` that a
  * bucket-partitioned layout turns into directory pruning
  * ([[SimilaritySearch.ivfTopKFromIndex]]'s mechanism).
  */
object ZoneMap {

  /** Per-bucket stats: (bucketCol, n_rows, <c>_min, <c>_max per stat col). */
  def collect(df: DataFrame, bucketCol: String, statCols: Seq[String]): DataFrame = {
    require(statCols.nonEmpty, "need at least one stat column")
    df.groupBy(col(bucketCol))
      .agg(
        count(lit(1)).as("n_rows"),
        statCols.flatMap(c =>
          Seq(min(col(c)).as(s"${c}_min"), max(col(c)).as(s"${c}_max"))): _*)
  }

  /** Stats ALGEBRA: fold stats of data slices into the stats of their
    * union — min/max/count all merge associatively, so zone maps of
    * appended partitions combine without re-scanning old data (the
    * incremental-maintenance property a lakehouse manifest relies on;
    * same shape as [[Hll.mergeRegisters]]).
    */
  def merge(stats: DataFrame, bucketCol: String, statCols: Seq[String]): DataFrame =
    stats.groupBy(col(bucketCol))
      .agg(
        sum("n_rows").as("n_rows"),
        statCols.flatMap(c =>
          Seq(min(col(s"${c}_min")).as(s"${c}_min"), max(col(s"${c}_max")).as(s"${c}_max"))): _*)

  /** Bucket ids whose [min,max] ranges overlap EVERY given (col, lo, hi)
    * predicate — the candidates a conjunctive range query must read.
    */
  def candidateBuckets(
      stats: DataFrame,
      bucketCol: String,
      preds: Seq[(String, Long, Long)]): Array[Any] = {
    require(preds.nonEmpty, "need at least one predicate")
    val cond = preds
      .map { case (c, lo, hi) => col(s"${c}_max") >= lo && col(s"${c}_min") <= hi }
      .reduce(_ && _)
    stats.filter(cond).select(bucketCol).collect().map(_.get(0))
  }

  /** Bucket-pruned conjunctive range filter — identical rows to the plain
    * filter, reading only overlapping buckets.
    */
  def prunedFilter(
      df: DataFrame,
      stats: DataFrame,
      bucketCol: String,
      preds: Seq[(String, Long, Long)]): DataFrame = {
    val buckets = candidateBuckets(stats, bucketCol, preds)
    val exact = preds
      .map { case (c, lo, hi) => col(c) >= lo && col(c) <= hi }
      .reduce(_ && _)
    df.filter(col(bucketCol).isin(buckets.toSeq: _*)).filter(exact)
  }
}
