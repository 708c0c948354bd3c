package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sliding-window document chunking — the retrieval/long-context prep step
  * (RAG indexing, long-document splitting for fixed-context encoders):
  * each document yields overlapping token windows of `width` tokens whose
  * starts step by `stride` (< width ⇒ overlap of width − stride tokens, so
  * no boundary-straddling span is ever lost to a cut).
  *
  * Contrast with [[Packing]]: packing lays MANY documents end-to-end into
  * fixed windows (pre-training batch shape); chunking splits ONE document
  * into many windows (retrieval shape). Both are pure integer window math.
  *
  * Scale shape: a pure narrow transform — tokenize, compute the chunk
  * count per document in closed form, explode a `sequence`, slice. No
  * shuffle, no window function, no state; the plan is scan → generate →
  * project, and the only fan-out is each document's own length divided by
  * the stride. Every decision is exact integer arithmetic, so a SQL engine
  * replays chunk boundaries and text bit-for-bit.
  */
object Chunking {

  /** One row per (document, chunk): (id, chunk, tok_start, tok_end,
    * n_chunk_tokens, chunk_text). Chunk starts are 0, stride, 2·stride, …;
    * the last chunk is the first one whose window reaches the document's
    * end (`nChunks = 1 + ceil(max(ntok − width, 0) / stride)`), so short
    * tails are covered by the final overlapping window rather than emitted
    * as a fragment. Empty documents yield no chunks.
    */
  def chunkSpans(
      df: DataFrame,
      idCol: String,
      textCol: String,
      width: Long,
      stride: Long): DataFrame = {
    require(width > 0, s"chunkSpans: width must be positive, got $width")
    require(stride > 0 && stride <= width,
      s"chunkSpans: stride must be in [1, width], got $stride (width $width)")
    val toks = filter(split(col(textCol), " "), t => length(t) > 0)
    df.select(col(idCol), toks.as("_tk"))
      .withColumn("_ntok", size(col("_tk")).cast("long"))
      .filter(col("_ntok") > 0)
      .withColumn(
        "chunk",
        explode(sequence(
          lit(0L),
          expr(s"(greatest(_ntok - ${width}L, 0L) + ${stride}L - 1L) div ${stride}L"))))
      .withColumn("tok_start", col("chunk") * lit(stride))
      .withColumn("tok_end", least(col("tok_start") + lit(width), col("_ntok")))
      .withColumn("n_chunk_tokens", col("tok_end") - col("tok_start"))
      .withColumn(
        "chunk_text",
        array_join(
          slice(col("_tk"), (col("tok_start") + 1).cast("int"),
            col("n_chunk_tokens").cast("int")),
          " "))
      .drop("_tk", "_ntok")
  }
}
