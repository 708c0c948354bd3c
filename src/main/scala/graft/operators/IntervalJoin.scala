package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval-overlap join: pairs of same-key rows whose [start, end]
  * intervals intersect — the two-sided sibling of [[AsOfJoin]] (point →
  * latest) and [[RangeJoin]] (point → window): sessions × incident
  * windows, validity intervals × validity intervals, reservation
  * conflicts.
  *
  * Plan shape (no inequality-join explosion): both sides explode to the
  * fixed-width time buckets their interval covers, candidates form on a
  * (key, bucket) EQUI-join, the multi-bucket fan-out collapses by
  * keeping ONLY the first shared bucket (`__bk = max(⌊ls/w⌋, ⌊rs/w⌋)` —
  * a stateless filter, so genuinely duplicate input rows keep their
  * multiplicity, unlike a full-row distinct), and the exact
  * `ls ≤ re ∧ rs ≤ le` predicate verifies. Per-row fan-out is
  * ⌈len/width⌉ + 1, so `bucketWidth` set near the typical interval
  * length keeps the explode a small constant while the equi-join hashes
  * on (key, bucket) — at 100 TB that is an even shuffle, where the naive
  * θ-join is a per-key cross product.
  */
object IntervalJoin {

  /** Overlapping pairs: left columns + right columns (caller renames to
    * avoid collisions). Long-domain bounds, inclusive ends.
    */
  def overlap(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      lStart: String,
      lEnd: String,
      rStart: String,
      rEnd: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive: $bucketWidth")
    def buckets(s: String, e: String) =
      explode(sequence(
        expr(s"$s div ${bucketWidth}L"),
        expr(s"$e div ${bucketWidth}L")))
    val l = left.withColumn("__bk", buckets(lStart, lEnd))
    val r = right.withColumn("__bk", buckets(rStart, rEnd))
    l.join(r, keyCols :+ "__bk")
      // an overlapping pair co-occurs in every shared bucket; the FIRST
      // shared bucket is max of the two start buckets, so this equality
      // keeps exactly one candidate per pair-instance — preserving input
      // row multiplicity where a full-row distinct() would collapse
      // identical input rows into one
      .filter(col("__bk") ===
        greatest(expr(s"$lStart div ${bucketWidth}L"), expr(s"$rStart div ${bucketWidth}L")))
      .drop("__bk")
      .filter(col(lStart) <= col(rEnd) && col(rStart) <= col(lEnd))
  }
}
