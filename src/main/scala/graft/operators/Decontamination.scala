package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Benchmark decontamination for training corpora: flag every corpus
  * document that shares at least one word n-gram with a (small) evaluation
  * set — the standard n-gram-overlap decontamination pass run before
  * training so that eval benchmarks don't leak into the training data.
  *
  * Scale shape (the whole point of the operator): the eval set is tiny
  * relative to the corpus (benchmark suites are thousands of documents vs
  * a 100 TB corpus), so its distinct n-gram set is collected into a
  * broadcast hash relation. The corpus side then streams: tokenize →
  * explode n-grams → broadcast hash SEMI-shape join → partial-aggregated
  * groupBy(doc). The corpus is never shuffled by gram — the only exchange
  * is the final per-document count aggregation, which map-side combines to
  * at most one row per (partition, contaminated doc). A 1000-executor run
  * reads each corpus split once, probes an in-memory gram set, and emits
  * only hits.
  *
  * Contract: n-grams are space-joined word windows over whitespace-split
  * non-empty tokens (same tokenization as [[TextAnalysis]]); a document
  * with fewer than n tokens has no n-grams and is never flagged. Output is
  * one row per CONTAMINATED corpus document:
  * (id, n_hit_grams, n_eval_docs) — distinct shared grams, and how many
  * distinct eval documents share at least one gram with it.
  */
object Decontamination {

  private def toks(c: org.apache.spark.sql.Column) =
    filter(split(c, " "), t => length(t) > 0)

  /** (id, gram) — distinct word n-grams per document. */
  def grams(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame = {
    val t = toks(col(textCol))
    val sh = when(
      size(t) >= n,
      transform(sequence(lit(0), size(t) - n), i => concat_ws(" ", slice(t, i + 1, lit(n)))))
      .otherwise(array().cast("array<string>"))
    df.select(col(idCol), explode(array_distinct(sh)).as("gram"))
  }

  /** Flag corpus docs sharing any word n-gram with the eval set.
    * Eval grams are broadcast; corpus grams stream through the join.
    */
  def flag(
      corpus: DataFrame,
      idCol: String,
      textCol: String,
      eval: DataFrame,
      evalIdCol: String,
      evalTextCol: String,
      n: Int): DataFrame = {
    val corpusGrams = grams(corpus, idCol, textCol, n)
    val evalGrams = grams(eval, evalIdCol, evalTextCol, n)
      .withColumnRenamed(evalIdCol, "__eval_id")
    // inner join rather than LEFT SEMI so n_eval_docs is computable; the
    // broadcast keeps it a corpus-linear probe either way.
    corpusGrams
      .join(broadcast(evalGrams), "gram")
      .groupBy(col(idCol))
      .agg(
        countDistinct(col("gram")).as("n_hit_grams"),
        countDistinct(col("__eval_id")).as("n_eval_docs"))
  }

  /** Bloom-prefiltered decontamination — identical OUTPUT to [[flag]]
    * (Bloom filters have no false negatives, and every Bloom survivor is
    * exact-verified by the gram join), with the corpus-side explode pruned
    * by a bitset probe BEFORE any join.
    *
    * Why this exists at 100 TB: [[flag]]'s probe cost is one broadcast-hash
    * lookup per corpus gram occurrence, and its verify relation is the full
    * eval gram table. When the eval suite is big (every benchmark x every
    * paraphrase template), the bitset is ~25× smaller than the gram
    * relation (~1.2 bytes/gram at fpp=1e-2 vs ~30-byte grams + hash-table
    * overhead), and with `broadcastJoin = false` the verify join becomes a
    * SHUFFLE join whose corpus side is only the Bloom survivors
    * (true hits + fpp·gram volume) — the regime where the eval grams don't
    * fit in executor memory at all. With `broadcastJoin = true` the verify
    * is the same broadcast probe as [[flag]], just over a pre-pruned
    * stream.
    *
    * The filter is sized from an exact distinct-gram count of the eval
    * side (one cheap action on the SMALL side — never corpus-sized).
    */
  def flagBloom(
      corpus: DataFrame,
      idCol: String,
      textCol: String,
      eval: DataFrame,
      evalIdCol: String,
      evalTextCol: String,
      n: Int,
      fpp: Double = 1e-2,
      broadcastJoin: Boolean = true): DataFrame = {
    val spark = corpus.sparkSession
    val corpusGrams = grams(corpus, idCol, textCol, n)
    val evalGrams = grams(eval, evalIdCol, evalTextCol, n)
      .withColumnRenamed(evalIdCol, "__eval_id")
    val distinctEvalGrams = evalGrams.select("gram").distinct()
    val nEval = distinctEvalGrams.count()
    val bloom = graft.functions.BloomFilter.build(distinctEvalGrams, "gram", fpp, nEval)
    val pruned = corpusGrams.filter(bloom.mightContainCol(spark, col("gram")))
    val verifySide = if (broadcastJoin) broadcast(evalGrams) else evalGrams
    pruned
      .join(verifySide, "gram")
      .groupBy(col(idCol))
      .agg(
        countDistinct(col("gram")).as("n_hit_grams"),
        countDistinct(col("__eval_id")).as("n_eval_docs"))
  }

  /** FUZZY decontamination: flag (corpus doc, eval doc) pairs whose
    * word-token sets have exact Jaccard ≥ τ — the near-duplicate tier that
    * exact n-gram matching misses (an eval document lightly paraphrased or
    * truncated into the corpus shares few exact n-grams but keeps a high
    * token-set Jaccard).
    *
    * Scale shape mirrors [[flag]]: the eval side is small, so BOTH its
    * banded MinHash signatures and its token sets broadcast; the corpus
    * streams — its own signature pass probes the broadcast band table, and
    * survivors verify against the broadcast token sets with the exact
    * intersection expression. The only exchange is the candidate-pair
    * dedup (volume ∝ near-dup density × bands, never corpus-sized). LSH
    * recall is set by b/r exactly as in [[Dedup.minhashDuplicatePairs]]
    * (b=32, r=3 → miss ≈ 1e-10 at J=0.8).
    *
    * Output: one row per flagged pair, (id, eval_id, inter, uni) — exact
    * set sizes, Jaccard = inter / uni derivable without float division.
    */
  def flagFuzzy(
      corpus: DataFrame,
      idCol: String,
      textCol: String,
      eval: DataFrame,
      evalIdCol: String,
      evalTextCol: String,
      tau: Double,
      bands: Int = 32,
      rowsPerBand: Int = 3): DataFrame = {
    val spark = corpus.sparkSession
    val corpusToks = SimilarityJoin.tokenize(corpus, idCol, textCol)
    val evalToks = SimilarityJoin.tokenize(eval, evalIdCol, evalTextCol)
    val corpusSigs = Dedup.bandSignatures(corpusToks, bands, rowsPerBand)
    val evalSigs = Dedup.bandSignatures(evalToks, bands, rowsPerBand)
      .select(col("sid").as("__eval_sid"), col("band"), col("bsig"))
    graft.functions.ArrayIntersectSize.register(spark)
    val candidates = corpusSigs
      .join(broadcast(evalSigs), Seq("band", "bsig"))
      .select(col("sid"), col("__eval_sid"))
      .dropDuplicates("sid", "__eval_sid")
    // candidates are the BUILD side (flagged fraction ≪ corpus; without the
    // hint Catalyst happily broadcasts the corpus tokens when local stats
    // look small — exactly the plan that dies at scale)
    corpusToks.select(col("sid"), col("toks").as("__c_toks"))
      .join(broadcast(candidates), "sid")
      .join(
        broadcast(evalToks.select(col("sid").as("__eval_sid"), col("toks").as("__e_toks"))),
        "__eval_sid")
      .withColumn(
        "inter",
        graft.functions.ArrayIntersectSize.intersect_size(col("__c_toks"), col("__e_toks")))
      .withColumn("uni", size(col("__c_toks")) + size(col("__e_toks")) - col("inter"))
      .filter(col("inter").cast("double") >= col("uni") * tau)
      .select(
        col("sid").as(idCol),
        col("__eval_sid").as("eval_id"),
        col("inter").cast("long").as("inter"),
        col("uni").cast("long").as("uni"))
  }

  /** SEMANTIC decontamination: flag corpus documents whose EMBEDDING sits
    * within cosine τ of any eval-set embedding — the paraphrase tier that
    * both exact n-gram overlap ([[flag]]) and token-set Jaccard
    * ([[flagFuzzy]]) miss: an eval answer reworded into the corpus shares
    * few tokens but keeps the embedding direction. Completes the
    * decontamination family's semantic tier, mirroring
    * [[SimilaritySearch.semanticDedup]] on the dedup side.
    *
    * Scale shape mirrors [[flag]]: benchmark suites are tiny next to a
    * 100 TB corpus, so the eval embeddings BROADCAST and the corpus
    * streams — one corpus-linear pass scoring each corpus vector against
    * the in-memory eval relation (the fused single-pass
    * [[graft.functions.CosineSimilarity]] kernel, no UDF), then a
    * map-side-combining per-doc aggregation. The corpus is never
    * shuffled; the only exchange carries one row per (partition,
    * contaminated doc).
    *
    * Output: one row per CONTAMINATED corpus document,
    * (id, n_eval_hits, eval_id) — how many eval embeddings are within τ,
    * and the SMALLEST hitting eval id (a total-order evidence pick, so no
    * float-argmax tie hazard reaches the contract).
    */
  def flagSemantic(
      corpus: DataFrame,
      idCol: String,
      embCol: String,
      eval: DataFrame,
      evalIdCol: String,
      evalEmbCol: String,
      tau: Double): DataFrame = {
    graft.functions.CosineSimilarity.register(corpus.sparkSession)
    corpus.select(col(idCol), col(embCol).as("__c_emb"))
      .crossJoin(broadcast(
        eval.select(col(evalIdCol).as("__e_id"), col(evalEmbCol).as("__e_emb"))))
      .filter(
        graft.functions.CosineSimilarity.cosine_sim(col("__c_emb"), col("__e_emb")) >= tau)
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_eval_hits"),
        min(col("__e_id")).as("eval_id"))
  }

  /** IVF-celled semantic decontamination — the regime where the eval side
    * is too big to broadcast (every benchmark × every paraphrase template
    * × every language, embedded). Centroids are the corpus's own
    * MD5-sampled SemDeDup centroids ([[SimilaritySearch.centroidsOf]]);
    * BOTH sides take their best-cosine cell against that one centroid
    * set, and candidates form on a cell EQUI-join — candidate volume is
    * Σ|corpus cell|·|eval cell|, never corpus × eval. Pairs straddling a
    * cell boundary are not compared: recall is governed by nCells exactly
    * as in SemDeDup (every hit this form reports is a true [[flagSemantic]]
    * hit — the spec pins containment), and at scale nCells grows with the
    * corpus so cell populations stay bounded.
    *
    * Same output contract as [[flagSemantic]], restricted to same-cell
    * pairs.
    */
  def flagSemanticCells(
      corpus: DataFrame,
      idCol: String,
      embCol: String,
      eval: DataFrame,
      evalIdCol: String,
      evalEmbCol: String,
      tau: Double,
      nCells: Int = 64): DataFrame = {
    val c = corpus.select(col(idCol).as("vid"), col(embCol).as("emb"))
    val e = eval.select(col(evalIdCol).as("vid"), col(evalEmbCol).as("emb"))
    val cents = SimilaritySearch.centroidsOf(c, nCells)
    val cAsg = SimilaritySearch.assignToCentroids(c, cents)
      .select(col("vid").as(idCol), col("emb").as("__c_emb"), col("cell"))
    val eAsg = SimilaritySearch.assignToCentroids(e, cents)
      .select(col("vid").as("__e_id"), col("emb").as("__e_emb"), col("cell"))
    cAsg.join(eAsg, Seq("cell"))
      .filter(SimilaritySearch.cosine(col("__c_emb"), col("__e_emb")) >= tau)
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_eval_hits"),
        min(col("__e_id")).as("eval_id"))
  }

  /** Convenience split used by the q57 query/oracle pair: eval set =
    * ids ≡ 0 (mod `evalEvery`), corpus = the rest.
    */
  def flagWithinTable(
      spark: SparkSession,
      docs: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      evalEvery: Int): DataFrame = {
    val eval = docs
      .filter(pmod(col(idCol), lit(evalEvery)) === 0)
      .select(col(idCol).as("__e_id"), col(textCol).as("__e_text"))
    val corpus = docs.filter(pmod(col(idCol), lit(evalEvery)) =!= 0)
    flag(corpus, idCol, textCol, eval, "__e_id", "__e_text", n)
  }
}
