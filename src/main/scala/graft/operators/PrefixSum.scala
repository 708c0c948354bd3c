package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed prefix sums without a data-sized global-order window.
  *
  * A bare `Window.orderBy(k)` funnels the whole relation through ONE task
  * — the classic Spark scale trap this repo bans from every operator. The
  * scalable form is recursive block decomposition: rows bucket by
  * ⌊k/blockSize⌋ (monotone in k, so block order IS key order — sparse or
  * dense keys both work), each block's partial sum rolls up one level,
  * and the roll-up recurses until ≤ 1 row remains (before ≡ 0 — no
  * window at all). Every window in the tree is a per-block
  * `partitionBy("blk")` window seeing at most blockSize rows (keys are
  * unique, so a block holds ≤ blockSize of them), and none is an
  * unpartitioned global window — WindowExec's single-partition warning
  * never fires. Depth: since the max bucket key shrinks by a factor of
  * blockSize per level, ≤ log_blockSize(maxKey) levels regardless of
  * sparsity (6 levels cover 2⁷² at the default 4096).
  *
  * Sum type follows the input column: longs stay exact longs, decimals
  * stay exact decimals (integer/fixed-point callers keep bit-exact
  * SQL-oracle-ability), doubles sum as doubles.
  */
object PrefixSum {

  /** Exclusive prefix over columns (k, s) → (k, before): before(k) =
    * Σ s over rows with smaller k. Keys must be unique and non-negative.
    *
    * The recursion bottoms out at ≤ 1 row (before ≡ 0) rather than at a
    * ≤ blockSize global-order window: unique keys bound every block to
    * ≤ blockSize rows, so the per-block `partitionBy("blk")` window is
    * just as bounded — and carries no "No Partition Defined" WindowExec
    * warning (round-11 hygiene). Costs ≤ 2 extra roll-up levels.
    */
  def exclusive(kv: DataFrame, blockSize: Int = 4096): DataFrame = {
    require(blockSize >= 2, s"blockSize must be >= 2: $blockSize")
    if (kv.limit(2).count() <= 1) {
      // s − s: a zero of the sum column's own type (long/decimal/double)
      kv.withColumn("before", col("s") - col("s")).select("k", "before")
    } else {
      val withBlk = kv.withColumn("blk", (col("k") / blockSize).cast("long"))
      val blockSums = withBlk.groupBy("blk").agg(sum("s").as("bsum"))
      val blockBefore = exclusive(
        blockSums.select(col("blk").as("k"), col("bsum").as("s")), blockSize)
        .select(col("k").as("blk"), col("before").as("blkBefore"))
      val withinW = Window.partitionBy("blk").orderBy("k")
        .rowsBetween(Window.unboundedPreceding, -1)
      withBlk
        .withColumn("within", coalesce(sum("s").over(withinW), lit(0)))
        .join(blockBefore, "blk")
        .select(col("k"), (col("within") + col("blkBefore")).as("before"))
    }
  }
}
