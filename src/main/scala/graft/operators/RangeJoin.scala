package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed RANGE join — all (left, right) pairs with equal keys and
  * `right.time ∈ [left.time + lower, left.time + upper]` (windowed
  * attribution, sensor correlation, feature lookback). A naive inequality
  * join is a per-key cross product; the scalable shape is BUCKETING:
  *
  *   - time is quantized into buckets of width `upper − lower`, so the
  *     admissible window of any left row spans AT MOST TWO buckets;
  *   - right rows land in their one bucket; left rows emit one probe row
  *     per overlapped bucket (≤ 2);
  *   - candidates come from the (keys, bucket) equi-join — hash-shuffled,
  *     AQE-balanced, no range explosion — and the exact window predicate
  *     filters them.
  *
  * Cost is output-volume plus ≤ 2× left emission, independent of how wide
  * a key's history is — the property a sort-merge inequality join loses on
  * skewed keys.
  */
object RangeJoin {

  /** Pairs with equal `keys` and `rTime ∈ [lTime + lower, upper + lTime]`
    * (inclusive both ends; lower ≤ upper; time columns are numeric, e.g.
    * epoch nanos). Column names must be disjoint apart from `keys` —
    * rename before calling. Output: left columns ++ right non-key columns.
    */
  def timeRange(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      lTime: String,
      rTime: String,
      lower: Long,
      upper: Long): DataFrame = {
    require(lower <= upper, s"empty window: [$lower, $upper]")
    require(keys.nonEmpty, "range join needs at least one key column")
    val width = math.max(upper - lower, 1L)

    // exact floor division in the LONG domain: `floor(col / lit)` would
    // round through double — at epoch-nano magnitudes the quotient can
    // land on the wrong side of a bucket boundary (ulp at 1e18 is 256 ns)
    def fdiv(c: org.apache.spark.sql.Column) =
      call_function("div", c - pmod(c, lit(width)), lit(width))

    val r = right.withColumn("__bkt", fdiv(col(rTime)))
    val l = left.withColumn(
      "__bkt",
      explode(sequence(fdiv(col(lTime) + lower), fdiv(col(lTime) + upper))))

    l.join(r, keys :+ "__bkt")
      .filter(col(rTime).between(col(lTime) + lower, col(lTime) + upper))
      .drop("__bkt")
  }
}
