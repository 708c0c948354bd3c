package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact repeated-substring detection — the verbatim-duplication pass of
  * "Deduplicating Training Data Makes Language Models Better" (Lee et
  * al. 2022, public method): find every maximal span of tokens that is
  * part of a k-token shingle occurring ≥ `minCount` times corpus-wide.
  * Document-level dedup ([[Dedup]]) can't see these — boilerplate
  * headers, license blocks, and templated passages repeat verbatim
  * inside otherwise-distinct documents, and span-level removal is what
  * dedup-sensitive training pipelines actually apply.
  *
  * Spark-first restatement of the paper's suffix-array scan: a suffix
  * array is a single-machine structure; the equivalent corpus-parallel
  * form is shingle inversion — every k-token shingle (ordered, not the
  * similarity family's token SETS) with its start position, a
  * corpus-wide occurrence count, and a gaps-and-islands merge of
  * adjacent repeated shingle starts into maximal spans. A span of j
  * consecutive repeated shingles certifies a repeated substring of
  * j+k−1 tokens (each window of k inside it repeats somewhere).
  *
  * Scale shape: shingles shuffle ONCE on an 8-byte xxhash64 key (never
  * the shingle text — at 100 TB the key width is the shuffle), the
  * occurrence filter is one map-side-combinable count, and the island
  * merge windows per document (bounded partitions: documents are
  * bounded; no global sort anywhere). Collisions only ever MERGE two
  * distinct shingles' counts (2⁻⁶⁴ per pair) — a vanishing
  * over-detection, the conservative direction for a removal pass.
  */
object SubstringDedup {

  /** Maximal repeated spans: (doc_id, start_tok, end_tok, n_shingles),
    * 0-based inclusive token positions, end_tok = last shingle start
    * + k − 1. Tokens are the non-empty single-space splits (mirrors the
    * corpus text contract used across the query pack).
    */
  def repeatedSpans(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      k: Int,
      minCount: Long): DataFrame = {
    require(k >= 2, s"shingle width must be ≥ 2: $k")
    require(minCount >= 2, s"minCount must be ≥ 2: $minCount")
    val toks = filter(split(col(textCol), " "), x => length(x) > 0)
    val base = docs.select(col(idCol).cast("long").as("sid"), toks.as("ts"))
    val sh = base
      .filter(size(col("ts")) >= k)
      .select(
        col("sid"),
        posexplode(expr(
          s"transform(sequence(0, size(ts) - $k), i -> array_join(slice(ts, i + 1, $k), ' '))"))
          .as(Seq("pos", "shingle")))
    val h = sh.select(col("sid"), col("pos").cast("long").as("pos"), xxhash64(col("shingle")).as("h"))
    val hot = h.groupBy("h").agg(count(lit(1)).as("occ")).filter(col("occ") >= minCount)
    val rep = h.join(hot.select("h"), "h")
    // gaps-and-islands per document: adjacent repeated shingle starts
    // collapse into one maximal span
    val w = Window.partitionBy("sid").orderBy("pos")
    rep
      .withColumn("g", col("pos") - row_number().over(w))
      .groupBy(col("sid"), col("g"))
      .agg(
        min("pos").as("start_tok"),
        (max("pos") + lit(k - 1).cast("long")).as("end_tok"),
        count(lit(1)).as("n_shingles"))
      .select(col("sid").as("doc_id"), col("start_tok"), col("end_tok"), col("n_shingles"))
  }

  /** Per-document duplication load: tokens covered by repeated spans
    * (spans are disjoint by construction, so coverage is Σ lengths) and
    * the share in integer basis points of the doc's token count.
    * Output: (doc_id, n_tokens, dup_tokens, dup_share_bp).
    */
  def duplicationLoad(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      k: Int,
      minCount: Long): DataFrame = {
    val toks = filter(split(col(textCol), " "), x => length(x) > 0)
    val lens = docs.select(col(idCol).cast("long").as("doc_id"), size(toks).cast("long").as("n_tokens"))
    val spans = repeatedSpans(docs, idCol, textCol, k, minCount)
      .groupBy("doc_id")
      .agg(sum(col("end_tok") - col("start_tok") + 1).as("dup_tokens"))
    lens
      .join(spans, Seq("doc_id"), "left")
      .withColumn("dup_tokens", coalesce(col("dup_tokens"), lit(0L)))
      .withColumn(
        "dup_share_bp",
        when(col("n_tokens") === 0, 0L)
          .otherwise(expr("(dup_tokens * 10000) div n_tokens")))
  }
}
