package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LLM pre-training batches: lay documents end-to-end
  * in a token stream and cut the stream every `budget` tokens — the
  * concat-and-chunk regime (GPT-style pretraining; see also T5's "pack
  * examples until the target length is reached"). A document then occupies
  * every context window its token span overlaps.
  *
  * Scale shape: a single global token stream would need a total order over
  * the corpus (one-partition window — a non-starter at 100 TB), so the
  * corpus is sharded into `nStreams` INDEPENDENT streams by `id mod
  * nStreams` and each stream is packed separately. `nStreams` scales with
  * the cluster; the only shuffle is the per-stream window (hash exchange
  * on `stream`, then a sort within each partition). Pack ids are
  * per-stream, which is what a data loader wants anyway: each reader rank
  * consumes its own stream without global coordination.
  *
  * All arithmetic is exact integer math (`sum` of token counts, integer
  * `div`), so a SQL engine replays it bit-for-bit: no floats anywhere.
  */
object Packing {

  /** Per-document pack spans. Output, one row per input document:
    * (id, stream, n_tokens, tok_start, first_pack, last_pack) where
    * `tok_start` is the document's offset in its stream's token stream and
    * `first_pack`/`last_pack` are the first/last `budget`-token windows it
    * overlaps (empty documents pin to the window at their offset).
    */
  def packSpans(
      df: DataFrame,
      idCol: String,
      textCol: String,
      budget: Long,
      nStreams: Int): DataFrame = {
    require(budget > 0, s"packSpans: budget must be positive, got $budget")
    require(nStreams > 0, s"packSpans: nStreams must be positive, got $nStreams")
    val nTok = size(filter(split(col(textCol), " "), t => length(t) > 0)).cast("long")
    val w = Window.partitionBy("stream").orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    df.select(
        col(idCol),
        pmod(col(idCol), lit(nStreams.toLong)).as("stream"),
        nTok.as("n_tokens"))
      .withColumn("tok_start", coalesce(sum("n_tokens").over(w), lit(0L)))
      .withColumn("first_pack", expr(s"tok_start div ${budget}L"))
      .withColumn(
        "last_pack",
        expr(s"(tok_start + greatest(n_tokens, 1L) - 1L) div ${budget}L"))
  }

  /** Per-pack manifest: for every (stream, pack) window, which documents
    * contribute and how many of the window's `budget` token slots they
    * fill. `n_docs` counts contributors; `fill_tokens` sums the clipped
    * per-document overlap, so a fully interior pack has `fill_tokens =
    * budget` and only each stream's LAST pack can be short. This is the
    * manifest a loader materializes; documents spanning many packs explode
    * into `last_pack - first_pack + 1` rows (bounded by ceil(len/budget) +
    * 1 — long documents are the only fan-out, and their fan-out is their
    * own length).
    */
  def packManifest(
      df: DataFrame,
      idCol: String,
      textCol: String,
      budget: Long,
      nStreams: Int): DataFrame = {
    val spans = packSpans(df, idCol, textCol, budget, nStreams)
    spans
      .select(
        col(idCol),
        col("stream"),
        col("n_tokens"),
        col("tok_start"),
        explode(sequence(col("first_pack"), col("last_pack"))).as("pack"))
      .withColumn(
        "fill_tokens",
        least(col("tok_start") + col("n_tokens"), (col("pack") + 1) * lit(budget)) -
          greatest(col("tok_start"), col("pack") * lit(budget)))
      .groupBy("stream", "pack")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("fill_tokens").as("fill_tokens"))
  }

  /** Deterministic global training order: assign every record to one of
    * `nShards` reader shards and a position within its shard — the
    * "shuffle once, read forever" layout a distributed data loader
    * consumes (each reader rank streams its own shard sequentially; the
    * corpus-wide order is the interleaving, epoch-stable by construction).
    *
    * Order comes from MD5 of the id (see [[Sampling.hashUniform]] for the
    * rationale: retry-stable, ingest-stable, engine-portable — a seeded
    * `rand()` order changes under repartition; a hash never does). Shard =
    * first 8 hex chars of the digest mod nShards, so shard assignment and
    * within-shard order derive from the SAME digest and a record's
    * placement never depends on the rest of the corpus.
    *
    * Scale shape: one hash exchange on `shard` (nShards partitions — set
    * nShards to O(cluster readers), thousands at 100 TB), then a
    * per-shard sort for `row_number`. Each shard sorts only its own
    * ~1/nShards slice; there is no global total order anywhere.
    */
  def trainingOrder(df: DataFrame, idCol: String, nShards: Int): DataFrame = {
    require(nShards > 0, s"trainingOrder: nShards must be positive, got $nShards")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("shard").orderBy(col("_h"), col(idCol))
    df.select(col(idCol), md5(col(idCol).cast("string")).as("_h"))
      .withColumn(
        "shard",
        pmod(conv(substring(col("_h"), 1, 8), 16, 10).cast("long"), lit(nShards.toLong)))
      .withColumn("pos", row_number().over(w).cast("long"))
      .drop("_h")
  }

  /** Per-EPOCH reshuffle: [[trainingOrder]] with the epoch number salted
    * into the digest (`md5(id || ':' || epoch)`), so every epoch gets an
    * independent deterministic permutation AND shard assignment — multi-
    * epoch training must not replay the identical batch order (gradient
    * correlation), and re-deriving the order from (id, epoch) alone keeps
    * it retry/ingest-stable with no stored shuffle state. Same plan shape
    * as [[trainingOrder]]: one hash exchange on shard, per-shard sorts.
    * Output: (id, epoch, shard, pos).
    */
  def epochOrder(df: DataFrame, idCol: String, nShards: Int, epoch: Int): DataFrame = {
    require(nShards > 0, s"epochOrder: nShards must be positive, got $nShards")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("shard").orderBy(col("_h"), col(idCol))
    df.select(
        col(idCol),
        md5(concat(col(idCol).cast("string"), lit(":"), lit(epoch).cast("string"))).as("_h"))
      .withColumn(
        "shard",
        pmod(conv(substring(col("_h"), 1, 8), 16, 10).cast("long"), lit(nShards.toLong)))
      .withColumn("pos", row_number().over(w).cast("long"))
      .withColumn("epoch", lit(epoch).cast("long"))
      .select(col(idCol), col("epoch"), col("shard"), col("pos"))
  }
}
