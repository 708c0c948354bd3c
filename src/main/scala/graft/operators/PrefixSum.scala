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
  * and the roll-up recurses until a level fits in one block (≤ blockSize
  * rows → a single bounded window finishes it; ≤ 1 row → before ≡ 0, no
  * window at all). Every window in the tree is a per-block
  * `partitionBy("blk")` window seeing at most blockSize rows (keys are
  * unique, so a block holds ≤ blockSize of them), and none is an
  * unpartitioned global window — WindowExec's single-partition warning
  * never fires. Depth: since the max bucket key shrinks by a factor of
  * blockSize per level, ≤ log_blockSize(maxKey) levels regardless of
  * sparsity (6 levels cover 2⁷² at the default 4096) — and the
  * ≤-blockSize tail means the COMMON case (a key-distinct histogram of a
  * few hundred buckets, q124/q158/q166/q180) is ONE stage. Each level's
  * input is materialized once (eager localCheckpoint): the recursion
  * consumes it three times, and un-truncated lineage re-executed the
  * corpus-sized upstream per consumption (the r11 q124/q158 bench creep).
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
  def exclusive(kv0: DataFrame, blockSize: Int = 4096): DataFrame = {
    require(blockSize >= 2, s"blockSize must be >= 2: $blockSize")
    // Materialize each level's input ONCE (eager localCheckpoint, lineage
    // truncated): the recursion consumes it three times per level (size
    // probe, block roll-up, within-block window), and without truncation
    // every consumption re-executes the whole upstream plan — for the
    // AUC/quantile family (q124/q158) that upstream is a corpus-sized
    // tokenize+histogram, measured 2.7-3.5× end-to-end before this fix.
    // Level inputs shrink by blockSize× per level, so the checkpointed
    // footprint is ~the first level's histogram (key-distinct grain).
    val kv = kv0.transform(graft.core.Materialize.apply)
    val n = kv.count()
    if (n <= 1) {
      // s − s: a zero of the sum column's own type (long/decimal/double)
      kv.withColumn("before", col("s") - col("s")).select("k", "before")
    } else if (n <= blockSize) {
      // Bounded single-block tail: once a level fits in one block the
      // remaining recursion is pure job-launch overhead (each level costs
      // a checkpoint job + count + groupBy shuffle + window + join; q124's
      // 257-key histogram was descending 6 levels). One per-block window
      // over a constant block — bounded by the SAME ≤ blockSize contract
      // as every within-block window in the recursion — finishes it in a
      // single stage. Types match the recursive path (coalesce(sum, 0)).
      // blk must be NON-FOLDABLE (k − k, not lit(0)): the optimizer strips
      // foldable expressions from the partition spec, and an emptied spec
      // is exactly the unpartitioned-WindowExec warning this tail avoids.
      val w = Window.partitionBy("blk").orderBy("k")
        .rowsBetween(Window.unboundedPreceding, -1)
      kv.withColumn("blk", col("k") - col("k"))
        .withColumn("before", coalesce(sum("s").over(w), lit(0)))
        .select("k", "before")
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

  /** Exclusive prefix MIN over columns (k, s) → (k, min_before):
    * min_before(k) = min s over rows with smaller k, NULL when no such
    * row (the scan's natural identity — `least` skips NULLs, so levels
    * compose without sentinels). Same block recursion, same bounds, same
    * WindowExec hygiene as [[exclusive]]; min is idempotent, so unlike
    * the sum scan the roll-up needs no exactness care at all. Keys must
    * be unique and non-negative.
    */
  def exclusiveMin(kv0: DataFrame, blockSize: Int = 4096): DataFrame = {
    require(blockSize >= 2, s"blockSize must be >= 2: $blockSize")
    val kv = kv0.transform(graft.core.Materialize.apply)
    val n = kv.count()
    if (n <= 1) {
      // a NULL of the scan column's own type
      kv.withColumn("min_before", when(lit(false), col("s"))).select("k", "min_before")
    } else if (n <= blockSize) {
      val w = Window.partitionBy("blk").orderBy("k")
        .rowsBetween(Window.unboundedPreceding, -1)
      kv.withColumn("blk", col("k") - col("k"))
        .withColumn("min_before", min("s").over(w))
        .select("k", "min_before")
    } else {
      val withBlk = kv.withColumn("blk", (col("k") / blockSize).cast("long"))
      val blockMins = withBlk.groupBy("blk").agg(min("s").as("bmin"))
      val blockBefore = exclusiveMin(
        blockMins.select(col("blk").as("k"), col("bmin").as("s")), blockSize)
        .select(col("k").as("blk"), col("min_before").as("blkBefore"))
      val withinW = Window.partitionBy("blk").orderBy("k")
        .rowsBetween(Window.unboundedPreceding, -1)
      withBlk
        .withColumn("within", min("s").over(withinW))
        .join(blockBefore, "blk")
        .select(col("k"), least(col("within"), col("blkBefore")).as("min_before"))
    }
  }
}
