package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-LM familiarity scoring with head/middle/tail bucketing — the
  * CCNet-style quality partition (Wenzek et al. 2020): score every document
  * under a language model trained on the corpus itself, then split the
  * corpus into three buckets by score so downstream mixing can oversample
  * the "head" (most LM-familiar) slice. Here the LM is the engine's own
  * count-based bigram model (the q108 KenLM-shape table), and all scoring
  * is exact fixed-point integer arithmetic so a SQL oracle replays it
  * bit-for-bit — no floating log-probs whose summation order could differ
  * across engines.
  *
  * Score definition (exact integers end to end):
  *   - per-bigram probability in basis points: `p_bp = (10000*cnt) div ctx`
  *     where `cnt` = corpus count of the bigram (admitted only when
  *     `cnt >= minCount` — rarer bigrams are OOV and score 0) and `ctx` =
  *     corpus count of the left word as a bigram prefix;
  *   - per-document `score_bp` = floor-mean of its bigram `p_bp`s
  *     (0 for documents with < 2 tokens).
  *
  * Bucketing is by VALUE thresholds, not by rank: `t1` = the score of the
  * ceil(n/3)-th document in descending score order, `t2` = the score of the
  * ceil(2n/3)-th; `score_bp >= t1` → head, `>= t2` → middle, else tail.
  * Ties share a bucket (so bucket sizes are n/3 only up to ties), which is
  * what makes the rule computable WITHOUT a global sort: `score_bp` lives
  * in the bounded domain [0, 10000], so the thresholds come from an exact
  * 10001-bin histogram — one map-side-combined aggregation and a
  * bounded-size driver fold, never a single-partition window over the
  * corpus. At 100 TB the corpus is shuffled ONCE (the per-doc distinct-
  * bigram rollup); the LM tables are vocabulary-sized derivations of that
  * rollup, the probe join runs at distinct-bigram granularity, and the
  * histogram is a bounded aggregation — nothing in the plan is
  * corpus-sized on one node.
  */
object LmScore {

  private def toks(c: Column): Column =
    filter(split(c, " "), x => length(x) > 0)

  /** (doc_id, n_bigrams, n_oov, score_bp, bucket) for every input row. */
  def familiarityBuckets(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      minCount: Long = 5): DataFrame = {
    val w = toks(col(textCol))
    // ONE pass over the corpus: per-doc DISTINCT bigrams with their
    // multiplicity `k`. Everything downstream — the LM's bigram counts,
    // the prefix context counts, and the per-doc scoring probe — derives
    // from this single map-side-combined aggregation, so the exploded
    // corpus is shuffled exactly once and Catalyst's exchange reuse keeps
    // the two in-plan consumers on the same shuffle output. The probe
    // join then runs at distinct-bigram granularity (k-weighted), which
    // on boilerplate-heavy corpora is far below occurrence granularity.
    val docBi = docs
      .select(
        col(idCol),
        explode(
          when(
            size(w) >= 2,
            transform(
              sequence(lit(0), size(w) - 2),
              i => struct(
                element_at(w, i + 1).as("w"),
                element_at(w, i + 2).as("next"))))
            .otherwise(array().cast("array<struct<w:string,next:string>>"))).as("p"))
      .select(col(idCol), col("p.w").as("w"), col("p.next").as("next"))
      .groupBy(col(idCol), col("w"), col("next"))
      .agg(count(lit(1)).as("k"))

    // The LM: bigram counts (admission threshold) + prefix context counts,
    // both bigram-vocabulary-sized rollups of docBi — never corpus-sized.
    val biAll = docBi.groupBy("w", "next").agg(sum("k").as("cnt"))
    val bi = biAll.filter(col("cnt") >= minCount)
    val ctx = biAll.groupBy("w").agg(sum("cnt").as("ctx"))

    val scored = docBi
      .join(ctx, "w")
      .join(bi, Seq("w", "next"), "left")
      .withColumn(
        "p_bp",
        when(col("cnt").isNull, lit(0L))
          .otherwise(expr("(10000 * cnt) div ctx")))
      .groupBy(col(idCol))
      .agg(
        sum(col("k")).as("n_bigrams"),
        sum(when(col("cnt").isNull, col("k")).otherwise(lit(0L))).as("n_oov"),
        sum(col("k") * col("p_bp")).as("s"))

    // Docs-sized (one row per document) — persisted so the histogram
    // job and the final result don't each re-execute the scoring DAG.
    val perDoc = docs
      .select(col(idCol))
      .join(scored, Seq(idCol), "left")
      .select(
        col(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("n_oov"), lit(0L)).as("n_oov"),
        when(coalesce(col("n_bigrams"), lit(0L)) === 0, lit(0L))
          .otherwise(expr("s div n_bigrams")).as("score_bp"))
      .persist()

    // Exact tercile thresholds from the bounded score histogram. The
    // collect is ≤ 10001 rows by construction (score_bp ∈ [0, 10000]) —
    // the bounded-collect pattern, not a data-sized driver pull.
    val hist = perDoc.groupBy("score_bp").agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(-_._1)
    val n = hist.map(_._2).sum
    val (t1, t2) = thresholds(hist, n)

    perDoc.withColumn(
      "bucket",
      when(col("score_bp") >= t1, lit("head"))
        .when(col("score_bp") >= t2, lit("middle"))
        .otherwise(lit("tail")))
  }

  /** CROSS-corpus familiarity: score `docs` under a bigram LM trained on a
    * SEPARATE reference corpus — the actual CCNet deployment shape (Wenzek
    * et al. 2020 score Common Crawl under a Wikipedia-trained LM; the
    * self-corpus [[familiarityBuckets]] is the bootstrap special case).
    * Training on a curated reference and scoring the wild corpus is what
    * makes the head/middle/tail partition a QUALITY signal rather than a
    * familiarity signal: "head" = most reference-like.
    *
    * Identical exact-integer contract and output schema as
    * [[familiarityBuckets]]: (id, n_bigrams, n_oov, score_bp, bucket).
    * Scale shape: the reference LM is a bigram-vocabulary-sized rollup of
    * the (usually much smaller) reference corpus; the scored corpus is
    * shuffled once for its per-doc distinct-bigram rollup and probes the
    * LM tables at distinct-bigram granularity. Terciles come from the
    * same bounded [0,10000] histogram — no global sort.
    *
    * OOV here means "bigram not admitted into the REFERENCE LM" — on a
    * corpus far from the reference most bigrams are OOV and score 0,
    * which is exactly the signal (those documents land in tail).
    */
  def familiarityBucketsAgainst(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      ref: DataFrame,
      refTextCol: String,
      minCount: Long = 5): DataFrame = {
    val w = toks(col(textCol))
    def bigrams(c: Column) =
      explode(
        when(
          size(c) >= 2,
          transform(
            sequence(lit(0), size(c) - 2),
            i => struct(
              element_at(c, i + 1).as("w"),
              element_at(c, i + 2).as("next"))))
          .otherwise(array().cast("array<struct<w:string,next:string>>"))).as("p")

    // reference LM: admitted bigram counts + prefix context counts, both
    // bigram-vocabulary-sized rollups of the reference corpus only
    val refBi = ref
      .select(bigrams(toks(col(refTextCol))))
      .select(col("p.w").as("w"), col("p.next").as("next"))
      .groupBy("w", "next").agg(count(lit(1)).as("cnt"))
    val bi = refBi.filter(col("cnt") >= minCount)
    val ctx = refBi.groupBy("w").agg(sum("cnt").as("ctx"))

    val docBi = docs
      .select(col(idCol), bigrams(w))
      .select(col(idCol), col("p.w").as("w"), col("p.next").as("next"))
      .groupBy(col(idCol), col("w"), col("next"))
      .agg(count(lit(1)).as("k"))

    // a prefix word absent from the reference has no ctx row: the bigram
    // is OOV (inner ctx join would DROP it and undercount n_bigrams, so
    // the join is left and p_bp falls to the OOV arm)
    val scored = docBi
      .join(ctx, Seq("w"), "left")
      .join(bi, Seq("w", "next"), "left")
      .withColumn(
        "p_bp",
        when(col("cnt").isNull || col("ctx").isNull, lit(0L))
          .otherwise(expr("(10000 * cnt) div ctx")))
      .groupBy(col(idCol))
      .agg(
        sum(col("k")).as("n_bigrams"),
        sum(when(col("cnt").isNull || col("ctx").isNull, col("k")).otherwise(lit(0L)))
          .as("n_oov"),
        sum(col("k") * col("p_bp")).as("s"))

    val perDoc = docs
      .select(col(idCol))
      .join(scored, Seq(idCol), "left")
      .select(
        col(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("n_oov"), lit(0L)).as("n_oov"),
        when(coalesce(col("n_bigrams"), lit(0L)) === 0, lit(0L))
          .otherwise(expr("s div n_bigrams")).as("score_bp"))
      .persist()

    val hist = perDoc.groupBy("score_bp").agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(-_._1)
    val n = hist.map(_._2).sum
    val (t1, t2) = thresholds(hist, n)

    perDoc.withColumn(
      "bucket",
      when(col("score_bp") >= t1, lit("head"))
        .when(col("score_bp") >= t2, lit("middle"))
        .otherwise(lit("tail")))
  }

  /** Interpolated Kneser–Ney familiarity — the smoothing tier the MLE
    * scorers above lack: an UNSEEN bigram scores its continuation
    * probability instead of 0 (Kneser & Ney 1995; Chen & Goodman 1999's
    * interpolated form), which is what makes held-out scoring a real
    * perplexity signal rather than an OOV counter. Discount fixed at
    * d = 3/4 (the Chen–Goodman-recommended region), so every probability
    * stays in ℚ and the fixed-point integer form replays bit-for-bit:
    *
    *   seen (cnt ≥ 1, ctx seen):
    *     p_bp = ⌊10000·((4·cnt − 3)·NT + 3·N1w·Ncont) / (4·ctx·NT)⌋
    *   unseen bigram, seen context:
    *     p_bp = ⌊10000·3·N1w·Ncont / (4·ctx·NT)⌋      (the backoff mass)
    *   unseen context:
    *     p_bp = ⌊10000·Ncont / NT⌋                    (pure continuation)
    *
    * where ctx = Σ counts with prefix w, N1w = distinct continuations of
    * w, Ncont = distinct left-contexts of `next`, NT = distinct bigram
    * types — all exact longs from the training rollup (cnt·NT must stay
    * under ~2·10¹⁴; beyond that widen to decimal). No admission
    * threshold: smoothing IS the rare-bigram treatment.
    *
    * Scale shape mirrors [[familiarityBucketsAgainst]]: the LM is a
    * bigram-vocabulary-sized rollup of the training corpus (+ two
    * distinct-count rollups and one scalar NT); the scored corpus
    * shuffles once and probes at distinct-bigram granularity.
    * Output: (id, n_bigrams, n_backoff, score_bp) where n_backoff counts
    * bigram occurrences scored through either backoff arm and score_bp =
    * ⌊Σ k·p_bp / Σ k⌋.
    */
  def knFamiliarity(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      train: DataFrame,
      trainTextCol: String): DataFrame = {
    def bigrams(c: Column) =
      explode(
        when(
          size(c) >= 2,
          transform(
            sequence(lit(0), size(c) - 2),
            i => struct(
              element_at(c, i + 1).as("w"),
              element_at(c, i + 2).as("next"))))
          .otherwise(array().cast("array<struct<w:string,next:string>>"))).as("p")

    val trainBi = train
      .select(bigrams(toks(col(trainTextCol))))
      .select(col("p.w").as("w"), col("p.next").as("next"))
      .groupBy("w", "next").agg(count(lit(1)).as("cnt"))
      .persist()
    val ctx = trainBi.groupBy("w")
      .agg(sum("cnt").as("ctx"), count(lit(1)).as("n1w"))
    val cont = trainBi.groupBy("next").agg(count(lit(1)).as("ncont"))
    val nTypes = trainBi.count() // one scalar
    require(nTypes > 0, "knFamiliarity needs a non-empty training corpus")

    val docBi = docs
      .select(col(idCol), bigrams(toks(col(textCol))))
      .select(col(idCol), col("p.w").as("w"), col("p.next").as("next"))
      .groupBy(col(idCol), col("w"), col("next"))
      .agg(count(lit(1)).as("k"))

    val scored = docBi
      .join(ctx, Seq("w"), "left")
      .join(trainBi, Seq("w", "next"), "left")
      .join(cont, Seq("next"), "left")
      .withColumn("__nc", coalesce(col("ncont"), lit(0L)))
      .withColumn(
        "p_bp",
        when(
          col("ctx").isNotNull && col("cnt").isNotNull,
          expr(s"(10000 * ((4*cnt - 3) * ${nTypes}L + 3 * n1w * __nc)) div (4 * ctx * ${nTypes}L)"))
          .when(
            col("ctx").isNotNull,
            expr(s"(10000 * 3 * n1w * __nc) div (4 * ctx * ${nTypes}L)"))
          .otherwise(expr(s"(10000 * __nc) div ${nTypes}L")))
      .withColumn("__backoff", col("cnt").isNull)
      .groupBy(col(idCol))
      .agg(
        sum(col("k")).as("n_bigrams"),
        sum(when(col("__backoff"), col("k")).otherwise(lit(0L))).as("n_backoff"),
        sum(col("k") * col("p_bp")).as("s"))

    docs
      .select(col(idCol))
      .join(scored, Seq(idCol), "left")
      .select(
        col(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("n_backoff"), lit(0L)).as("n_backoff"),
        when(coalesce(col("n_bigrams"), lit(0L)) === 0, lit(0L))
          .otherwise(expr("s div n_bigrams")).as("score_bp"))
  }

  /** Score values at descending-order ranks ceil(n/3) and ceil(2n/3):
    * walk the descending histogram and take the first value whose
    * cumulative count reaches the rank.
    */
  private[operators] def thresholds(
      histDesc: Seq[(Long, Long)], n: Long): (Long, Long) = {
    require(n > 0, "familiarityBuckets needs a non-empty corpus")
    val r1 = (n + 2) / 3
    val r2 = (2 * n + 2) / 3
    def at(rank: Long): Long = {
      var cum = 0L
      for ((v, c) <- histDesc) {
        cum += c
        if (cum >= rank) return v
      }
      histDesc.last._1
    }
    (at(r1), at(r2))
  }
}
