package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed byte-pair-encoding tokenizer TRAINING (Sennrich et al. 2016,
  * the BPE family behind GPT/Llama vocabularies) plus corpus encoding with
  * the learned merges — the "train the tokenizer on the corpus" step of an
  * LLM data pipeline, expressed Spark-first.
  *
  * The classic algorithm folds the corpus to a word→count dictionary and
  * then loops: count adjacent symbol pairs weighted by word frequency, take
  * the most frequent pair, merge it everywhere. Here the word-count
  * dictionary is a DISTRIBUTED relation (vocabulary-sized — corpus tokens
  * collapse by `groupBy(word)`, the one corpus-sized shuffle), and each
  * iteration is one map-side-combined pair-count aggregation over it plus a
  * narrow column rewrite; only the single argmax row and the k merge rows
  * ever reach the driver. At 100 TB the per-iteration cost is a scan of the
  * vocabulary relation, not of the corpus; for production-scale merge
  * counts (30k+) iterations batch naturally (apply the top-m
  * non-interacting pairs per round) — the loop structure is unchanged.
  *
  * Symbol sequences are represented as space-delimited strings
  * (`" l o w </w> "`) so a merge is a plain substring replacement, a
  * primitive with IDENTICAL left-to-right non-overlapping semantics in
  * Spark and DuckDB — which makes the whole training loop exactly
  * SQL-replayable. One deliberate spec choice: a merge applies
  * `replace` TWICE. Single-pass replace consumes the delimiter shared by
  * back-to-back occurrences (`"x a b a b"` merges only the first pair);
  * the second pass merges those skipped follow-ups. The result differs
  * from strict symbol-list left-to-right pairing only inside same-symbol
  * runs of length ≥ 5 (`"a a a a a"` → `aa a aa` instead of `aa aa a` —
  * same multiset, different positions), a documented degenerate case; in
  * exchange every engine that has `replace` replays training bit-for-bit.
  */
object BpeTrain {

  final case class MergeStep(
      step: Int, lhs: String, rhs: String, pair_cnt: Long, corpus_symbols: Long)

  /** End-of-word marker: merges never cross word boundaries and the
    * learned vocabulary distinguishes suffixes from infixes.
    */
  val EndOfWord = "</w>"

  /** `"low"` → `" l o w </w> "`: every symbol space-delimited with leading
    * and trailing space, so `" a b "` matches exactly symbol-adjacent
    * pairs.
    */
  def spacedSymbols(word: Column): Column =
    concat(lit(" "), regexp_replace(word, "(.)", "$1 "), lit(EndOfWord + " "))

  private def symbols(s: Column): Column =
    filter(split(s, " "), x => length(x) > 0)

  /** One merge: both replace passes (see object doc). */
  def applyMerge(s: Column, lhs: String, rhs: String): Column = {
    val pat = lit(s" $lhs $rhs ")
    val rep = lit(s" $lhs$rhs ")
    replace(replace(s, pat, rep), pat, rep)
  }

  private def words(docs: DataFrame, textCol: String): DataFrame =
    docs
      .select(explode(filter(split(col(textCol), " "), x => length(x) > 0)).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cnt"))

  /** Learn `nMerges` merges. Returns one `MergeStep` per iteration with
    * the winning pair, its weighted count, and the corpus symbol count
    * AFTER applying it. Ties break on (count desc, lhs asc, rhs asc) —
    * fully deterministic.
    */
  def learn(docs: DataFrame, textCol: String, nMerges: Int): Seq[MergeStep] = {
    var cur = words(docs, textCol)
      .select(col("cnt"), spacedSymbols(col("w")).as("s"))
      .persist()
    cur.count()
    val out = Seq.newBuilder[MergeStep]
    var step = 1
    var exhausted = false
    while (step <= nMerges && !exhausted) {
      val y = symbols(col("s"))
      val best = cur
        .select(col("cnt"), y.as("y"))
        .select(
          col("cnt"),
          explode(
            when(
              size(col("y")) >= 2,
              transform(
                sequence(lit(0), size(col("y")) - 2),
                j => struct(
                  element_at(col("y"), j + 1).as("a"),
                  element_at(col("y"), j + 2).as("b"))))
              .otherwise(array().cast("array<struct<a:string,b:string>>"))).as("p"))
        .groupBy("p.a", "p.b").agg(sum("cnt").as("pc"))
        .orderBy(col("pc").desc, col("a"), col("b"))
        .limit(1)
        .collect()
      if (best.isEmpty) exhausted = true
      else {
        val (a, b, pc) = (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        val next = cur
          .select(col("cnt"), applyMerge(col("s"), a, b).as("s"))
          .persist()
        val corpusSymbols = next
          .agg(sum(col("cnt") * size(symbols(col("s")))).as("cs"))
          .head().getLong(0)
        cur.unpersist()
        cur = next
        out += MergeStep(step, a, b, pc, corpusSymbols)
        step += 1
      }
    }
    cur.unpersist()
    out.result()
  }

  /** The learned merge table as a relation (q117's output shape). */
  def learnTable(
      spark: SparkSession, docs: DataFrame, textCol: String, nMerges: Int): DataFrame = {
    import spark.implicits._
    learn(docs, textCol, nMerges)
      .toDF("step", "lhs", "rhs", "pair_cnt", "corpus_symbols")
  }

  /** Encode the corpus with an already-learned merge list: tokenize, apply
    * the merges to every word occurrence in learned order, count the
    * resulting BPE symbols per document. Corpus-linear, shuffle only on
    * the per-doc aggregation; rows with no tokens report (0, 0).
    * Output: (id, n_words, n_bpe).
    */
  def encode(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      merges: Seq[MergeStep]): DataFrame = {
    val perWord = docs
      .select(col(idCol), explode(filter(split(col(textCol), " "), x => length(x) > 0)).as("w"))
      .select(
        col(idCol),
        merges.foldLeft(spacedSymbols(col("w")))((s, m) => applyMerge(s, m.lhs, m.rhs)).as("s"))
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_words"),
        sum(size(symbols(col("s")))).as("n_bpe"))
    docs
      .select(col(idCol))
      .join(perWord, Seq(idCol), "left")
      .select(
        col(idCol),
        coalesce(col("n_words"), lit(0L)).as("n_words"),
        coalesce(col("n_bpe").cast("long"), lit(0L)).as("n_bpe"))
  }

  /** Tokenizer FERTILITY audit: tokens-per-word and chars-per-token of a
    * learned merge list, grouped by a stratum column (language, source) —
    * the fitness report a pipeline runs when a tokenizer trained on one
    * mixture meets another corpus (fertility spikes on a language mean the
    * tokenizer fragments it, inflating training cost and degrading that
    * language's effective context length). Exact integer basis points, so
    * the contract is engine-portable.
    *
    * Scale shape: [[encode]]'s corpus-linear merge application, then ONE
    * map-side-combining rollup to a stratum-sized relation — no extra
    * shuffle beyond encode's own per-doc aggregation.
    *
    * Output: (strataCol, n_docs, n_words, n_bpe, n_chars,
    * fertility_bp = ⌊10⁴·n_bpe/n_words⌋,
    * chars_per_tok_bp = ⌊10⁴·n_chars/n_bpe⌋) — 0 where the denominator is
    * 0 (an all-empty stratum).
    */
  def fertility(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      strataCol: String,
      merges: Seq[MergeStep]): DataFrame = {
    val enc = encode(docs, idCol, textCol, merges)
    val perDoc = docs.select(
      col(idCol),
      col(strataCol),
      aggregate(
        filter(split(col(textCol), " "), w => length(w) > 0),
        lit(0L),
        (acc, w) => acc + length(w)).as("n_chars"))
    perDoc
      .join(enc, Seq(idCol))
      .groupBy(col(strataCol))
      .agg(
        count(lit(1)).as("n_docs"),
        sum("n_words").as("n_words"),
        sum("n_bpe").as("n_bpe"),
        sum("n_chars").as("n_chars"))
      .withColumn(
        "fertility_bp",
        when(col("n_words") === 0, lit(0L))
          .otherwise(expr("(10000 * n_bpe) div n_words")))
      .withColumn(
        "chars_per_tok_bp",
        when(col("n_bpe") === 0, lit(0L))
          .otherwise(expr("(10000 * n_chars) div n_bpe")))
  }
}
