package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sub-document exact deduplication: split every document into blocks,
  * keep only the globally FIRST occurrence of each distinct block, and
  * reassemble the surviving blocks per document — the passage-level dedup
  * of "Deduplicating Training Data Makes Language Models Better" (Lee et
  * al. 2021), where repeated boilerplate paragraphs are removed from every
  * document except the first one that carried them.
  *
  * Blocks here are fixed windows of `blockWords` consecutive tokens (the
  * corpus has no paragraph delimiters; with real text, split on the
  * delimiter first and feed the pieces through the same keep-first core).
  * First occurrence = smallest (id, block index) — a total order, so the
  * survivor set is deterministic under any execution order.
  *
  * Scale shape: one explode (docs → blocks, fan-out len/blockWords), one
  * hash exchange on the block text for the keep-first window, one hash
  * exchange back on the id for reassembly. The window partitions by the
  * block CONTENT, so a boilerplate block repeated millions of times lands
  * in one partition as one group — a min over a sorted run, not a
  * driver-side structure. Group keys are the block strings themselves
  * (~`blockWords` words ≈ bytes comparable to a digest; grouping by
  * `xxhash64(block)` halves exchange bytes at the cost of an oracle that
  * can replay the hash — content keys keep the operator engine-portable).
  */
object BlockDedup {

  /** (id, bidx, block) — posexploded `blockWords`-token windows; the last
    * block of a document may be short.
    */
  def blocks(df: DataFrame, idCol: String, textCol: String, blockWords: Int): DataFrame = {
    require(blockWords > 0, s"blocks: blockWords must be positive, got $blockWords")
    val toks = filter(split(col(textCol), " "), t => length(t) > 0)
    val nBlocks = ceil(size(toks).cast("double") / blockWords).cast("int")
    val parts = transform(
      sequence(lit(0), greatest(nBlocks, lit(1)) - 1),
      i => array_join(slice(toks, i * blockWords + 1, lit(blockWords)), " "))
    df.select(col(idCol), posexplode(parts).as(Seq("bidx", "block")))
  }

  /** Per-document dedup result: (id, n_blocks, n_kept, dedup_text) where
    * `dedup_text` re-joins the document's surviving blocks in order.
    * Documents whose every block first appeared elsewhere come out with
    * `n_kept = 0` and an empty string — the rows a curation pipeline
    * drops next.
    */
  def dedup(df: DataFrame, idCol: String, textCol: String, blockWords: Int): DataFrame = {
    val b = blocks(df, idCol, textCol, blockWords)
    val firstW = Window.partitionBy("block")
    val kept = b
      .withColumn("first_id", min(idCol).over(firstW))
      .withColumn(
        "first_bidx",
        min(when(col(idCol) === col("first_id"), col("bidx"))).over(firstW))
      .withColumn(
        "keep",
        (col(idCol) === col("first_id") && col("bidx") === col("first_bidx")).cast("int"))
    kept
      .groupBy(idCol)
      .agg(
        count(lit(1)).as("n_blocks"),
        sum("keep").cast("long").as("n_kept"),
        array_join(
          transform(
            array_sort(collect_list(when(col("keep") === 1, struct(col("bidx"), col("block"))))),
            s => s.getField("block")),
          " ").as("dedup_text"))
  }
}
