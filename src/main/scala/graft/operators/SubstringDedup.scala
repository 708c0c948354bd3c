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

  /** [[repeatedSpans]] merged into TOKEN-DISJOINT intervals per doc:
    * two shingle islands separated by one missing start still overlap in
    * token coverage (island A ends at p−1+k−1, island B starts at p+1 —
    * k−2 shared tokens), so consumers that count or excise tokens need
    * the classic interval merge (per-doc window: running max of end).
    * Output: (doc_id, start_tok, end_tok).
    */
  def mergedSpans(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      k: Int,
      minCount: Long): DataFrame = {
    val spans = repeatedSpans(docs, idCol, textCol, k, minCount)
    val w = Window.partitionBy("doc_id").orderBy("start_tok")
    val prevMax = max("end_tok").over(w.rowsBetween(Window.unboundedPreceding, -1))
    spans
      .withColumn("ni", (col("start_tok") > coalesce(prevMax, lit(-1L))).cast("long"))
      .withColumn("isl", sum("ni").over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy("doc_id", "isl")
      .agg(min("start_tok").as("start_tok"), max("end_tok").as("end_tok"))
      .select("doc_id", "start_tok", "end_tok")
  }

  /** Per-document duplication load: DISTINCT tokens covered by repeated
    * spans ([[mergedSpans]], so overlaps never double-count) and the
    * share in integer basis points of the doc's token count.
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
    val spans = mergedSpans(docs, idCol, textCol, k, minCount)
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

  /** The ACT half of the pass (Lee et al. §3: keep one occurrence of each
    * duplicated substring, remove the rest): every merged repeated span
    * is grouped by its exact token text; the GLOBAL FIRST occurrence
    * (min (doc_id, start_tok)) is canonical and stays, every other
    * occurrence's tokens are excised, and documents reassemble from
    * their kept tokens (single-space joined — the same token contract
    * both directions). Output: (doc_id, clean_text), every input doc
    * present (a fully-templated doc comes back empty).
    *
    * Scale shape: the canonical choice is a map-side-combinable
    * `min(struct)` agg keyed by the span-text HASH — a celebrity
    * boilerplate with 10⁸ occurrences combines locally instead of
    * funneling one window partition; the excision join is an equi-join
    * on doc_id against per-doc span lists (bounded), and reassembly
    * sorts per doc (bounded documents, no global sort).
    */
  def removeRepeatedSpans(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      k: Int,
      minCount: Long): DataFrame = {
    val toks = filter(split(col(textCol), " "), x => length(x) > 0)
    val base = docs.select(col(idCol).cast("long").as("doc_id"), toks.as("ts"))
    val spans = mergedSpans(docs, idCol, textCol, k, minCount)
      .join(base, "doc_id")
      .withColumn(
        "span_h",
        xxhash64(expr("array_join(slice(ts, start_tok + 1, end_tok - start_tok + 1), ' ')")))
      .select("doc_id", "start_tok", "end_tok", "span_h")
    val canon = spans
      .groupBy("span_h")
      .agg(min(struct(col("doc_id"), col("start_tok"))).as("c"))
    val removable = spans
      .join(canon, "span_h")
      .filter(!(struct(col("doc_id"), col("start_tok")) === col("c")))
      .select(col("doc_id"), col("start_tok").as("rs"), col("end_tok").as("re"))
    val toksPos = base.select(col("doc_id"), posexplode(col("ts")).as(Seq("pos", "tok")))
    val kept = toksPos
      .join(removable,
        toksPos("doc_id") === removable("doc_id") &&
          col("pos") >= col("rs") && col("pos") <= col("re"),
        "left_anti")
      .groupBy("doc_id")
      .agg(array_join(
        transform(
          array_sort(collect_list(struct(col("pos"), col("tok")))),
          x => x.getField("tok")),
        " ").as("clean_text"))
    base.select("doc_id")
      .join(kept, Seq("doc_id"), "left")
      .withColumn("clean_text", coalesce(col("clean_text"), lit("")))
  }
}
