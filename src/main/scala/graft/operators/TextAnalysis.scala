package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operator pack for LLM data pipelines over a document
  * table: per-document statistics, quality scoring, stopword-profile
  * language identification, sub-token counting, and shingle
  * fingerprinting. One reusable projection each — all codegen'd built-in
  * expressions (no UDFs), so the transforms run inside whole-stage codegen
  * and scan-prune to (id, text) at the parquet reader.
  *
  * Cross-engine contract: every derived value is either an exact integer
  * or a double computed with one fixed operation order, so a SQL oracle
  * reproduces results bit-for-bit.
  */
object TextAnalysis {

  /** Tiny per-language stopword profiles for the language-ID heuristic.
    * Deliberately small and hard-coded: the heuristic's value is its
    * shape (profile-ratio argmax), not lexicon coverage.
    */
  val StopwordProfiles: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "zu", "ist", "ein", "nicht"),
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "on"),
    "es" -> Seq("el", "la", "de", "y", "en", "es", "un", "que"),
    "fr" -> Seq("le", "la", "de", "et", "en", "est", "un", "que"))

  private def toks(textCol: Column): Column =
    filter(split(textCol, " "), t => length(t) > 0)

  private def stopRatio(tokens: Column, words: Seq[String]): Column = {
    val hits = size(filter(tokens, t => t.isin(words.map(lit): _*)))
    hits.cast("double") / size(tokens)
  }

  /** Per-document statistics + composite quality score (SURVEY LLM op #4).
    * Output: (id, n_chars, n_tokens, n_uniq, n_subtokens, avg_tok_len,
    * punct_ratio, digit_ratio, stop_ratio, quality).
    *
    *   - `n_subtokens`: BPE-ish pre-tokenization count — runs of letters,
    *     runs of digits, or single other non-space characters.
    *   - `quality`: weighted blend of length saturation, lexical
    *     diversity, and stopword naturalness — the standard
    *     heuristic-quality shape used for corpus filtering.
    */
  def stats(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = toks(col(textCol))
    val nTok = size(t)
    val nUniq = size(array_distinct(t))
    val totalTokLen = aggregate(t, lit(0), (acc, x) => acc + length(x))
    val nChars = length(col(textCol))
    val punct = length(regexp_replace(col(textCol), "[A-Za-z0-9 ]", ""))
    val digits = length(regexp_replace(col(textCol), "[^0-9]", ""))
    val stopEn = stopRatio(t, StopwordProfiles.find(_._1 == "en").get._2)
    val nStop = size(filter(t, x =>
      x.isin(StopwordProfiles.find(_._1 == "en").get._2.map(lit): _*)))
    // quality = 0.4·min(n,100)/100 + 0.3·uniq/n + 0.3·stop/n, computed as a
    // SINGLE integer-ratio division: the three-term double sum is
    // association-order-sensitive in the last ulp, which flipped a
    // round(·,4) tie between engines — one division of two exact integers
    // is bit-identical everywhere.
    val qualityNum = (lit(4L) * least(nTok, lit(100)) * nTok +
      lit(300L) * nUniq + lit(300L) * nStop).cast("double")
    val qualityDen = (lit(1000L) * nTok).cast("double")
    df.select(
      col(idCol),
      nChars.as("n_chars"),
      nTok.cast("long").as("n_tokens"),
      nUniq.cast("long").as("n_uniq"),
      size(regexp_extract_all(col(textCol), lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0)))
        .cast("long").as("n_subtokens"),
      round(totalTokLen.cast("double") / nTok, 4).as("avg_tok_len"),
      round(punct.cast("double") / nChars, 4).as("punct_ratio"),
      round(digits.cast("double") / nChars, 4).as("digit_ratio"),
      round(stopEn, 4).as("stop_ratio"),
      round(qualityNum / qualityDen, 4).as("quality"))
  }

  /** Stopword-profile language ID: the language whose profile has the
    * highest token hit-ratio wins; ties resolve to the first profile in
    * [[StopwordProfiles]] order (deterministic). Output:
    * (id, lang_pred, lang_score).
    */
  def languageId(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = toks(col(textCol))
    val ratios = StopwordProfiles.map { case (lang, words) => lang -> stopRatio(t, words) }
    val best = ratios.map(_._2).reduce((a, b) => greatest(a, b))
    val pred = ratios.foldRight(lit("und"): Column) { case ((lang, r), els) =>
      when(r === best, lit(lang)).otherwise(els)
    }
    // foldRight gives the FIRST profile in order the win on ties (its
    // `when` is outermost).
    df.select(
      col(idCol),
      pred.as("lang_pred"),
      round(best, 4).as("lang_score"))
  }

  /** Heuristic quality-filter rule battery (the Gopher/C4-style document
    * gate): per-document repetition and diversity signals plus the rule
    * bits a corpus filter would AND together. All signals are computed
    * inside whole-stage codegen with no shuffle — the operator is a pure
    * corpus-linear projection, which is exactly what a 100 TB filter pass
    * must be.
    *
    * Signals (each a round(·,4) of ONE division of exact integers, so SQL
    * oracles replay bit-for-bit):
    *   - `top_tok_frac`: occurrences of the most frequent token / tokens —
    *     the single-word repetition signal;
    *   - `dup_2gram_frac`: 1 − distinct/total 2-grams — the phrase
    *     repetition signal (0 for docs with < 2 tokens);
    *   - `distinct_frac`: lexical diversity.
    * Rule bits (ints, so cross-engine hashing is exact): r_len = token
    * count within [minTok, maxTok]; r_wlen = mean token length in [3, 10];
    * r_div = distinct_frac ≥ 0.25; r_rep = dup_2gram_frac ≤ 0.9;
    * `pass` = all four.
    */
  /** Occurrences of a token array's most frequent token via sort + one
    * run-length fold — the naive distinct×filter form is O(u·n) per
    * document. Shared by [[qualityRules]]' repetition signal and the
    * q156 skyline criteria.
    */
  def topTokenCount(tokens: Column): Column =
    aggregate(
      array_sort(tokens),
      struct(lit("").as("prev"), lit(0).as("run"), lit(0).as("best")),
      (acc, x) => {
        val run = when(x === acc("prev"), acc("run") + 1).otherwise(lit(1))
        struct(x.as("prev"), run.as("run"), greatest(acc("best"), run).as("best"))
      },
      acc => acc("best"))

  def qualityRules(
      df: DataFrame,
      idCol: String,
      textCol: String,
      minTok: Int = 30,
      maxTok: Int = 50000): DataFrame = {
    // STAGED projections, one expensive array per stage: higher-order
    // functions are interpreted (CodegenFallback) and one flat projection
    // re-evaluates the whole split/shingle subtree once PER REFERENCING
    // COLUMN — the flat form measured 12.8 s at sf0.1 vs 4.4 s staged.
    // CollapseProject keeps the stages (multiply-referenced non-cheap
    // aliases), so each array is computed once per row.
    val t = col("__toks")
    val topCount = topTokenCount(t)
    val grams2 = when(
      size(t) >= 2,
      transform(sequence(lit(0), size(t) - 2), i => concat_ws(" ", slice(t, i + 1, lit(2)))))
      .otherwise(array().cast("array<string>"))
    val counted = df
      .select(col(idCol), toks(col(textCol)).as("__toks"))
      .select(
        col(idCol),
        size(t).as("__n"),
        size(array_distinct(t)).as("__u"),
        aggregate(t, lit(0), (acc, x) => acc + length(x)).as("__tl"),
        topCount.as("__top"),
        grams2.as("__g2"))
      .select(
        col(idCol), col("__n"), col("__u"), col("__tl"), col("__top"),
        size(col("__g2")).as("__n2"),
        size(array_distinct(col("__g2"))).as("__u2"))
    val nTok = col("__n")
    val avgTokLen = round(col("__tl").cast("double") / nTok, 4)
    val topFrac = round(col("__top").cast("double") / nTok, 4)
    val dup2Frac = when(
      col("__n2") > 0,
      round((col("__n2") - col("__u2")).cast("double") / col("__n2"), 4))
      .otherwise(lit(0.0))
    val distinctFrac = round(col("__u").cast("double") / nTok, 4)
    val rLen = (col("n_tokens") >= minTok && col("n_tokens") <= maxTok).cast("int")
    val rWlen = (col("avg_tok_len") >= 3.0 && col("avg_tok_len") <= 10.0).cast("int")
    val rDiv = (col("distinct_frac") >= 0.25).cast("int")
    val rRep = (col("dup_2gram_frac") <= 0.9).cast("int")
    counted
      .select(
        col(idCol),
        nTok.cast("long").as("n_tokens"),
        avgTokLen.as("avg_tok_len"),
        distinctFrac.as("distinct_frac"),
        topFrac.as("top_tok_frac"),
        dup2Frac.as("dup_2gram_frac"))
      .select(
        col(idCol), col("n_tokens"), col("avg_tok_len"), col("distinct_frac"),
        col("top_tok_frac"), col("dup_2gram_frac"),
        rLen.as("r_len"), rWlen.as("r_wlen"), rDiv.as("r_div"), rRep.as("r_rep"))
      .withColumn("pass", col("r_len") * col("r_wlen") * col("r_div") * col("r_rep"))
  }

  /** Corpus-level n-gram novelty — the cross-document boilerplate signal
    * single-document stats can't see: for each document, what fraction of
    * its distinct word n-grams appear in NO other document (`novel_frac`),
    * and the highest document frequency any of its grams reaches
    * (`max_df`, the boilerplate indicator).
    *
    * Scale shape: distinct grams per doc (corpus-linear, no shuffle) →
    * gram document-frequency aggregation (one shuffle by gram,
    * partial-agg'd — each doc contributes each gram once by construction,
    * so count(*) IS df) → join back by gram → per-doc aggregation. Two
    * shuffles total, both on keys with corpus-bounded cardinality; no
    * broadcast of anything data-sized. Documents with fewer than n tokens
    * have no grams and are absent from the output.
    * Output: (id, n_grams, novel_frac, max_df).
    */
  def ngramNovelty(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame = {
    val g = Decontamination.grams(df, idCol, textCol, n)
    val dfreq = g.groupBy("gram").agg(count(lit(1)).as("df"))
    g.join(dfreq, "gram")
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_grams"),
        sum(when(col("df") === 1, 1L).otherwise(0L)).as("novel"),
        max(col("df")).as("max_df"))
      .select(
        col(idCol),
        col("n_grams"),
        round(col("novel").cast("double") / col("n_grams"), 4).as("novel_frac"),
        col("max_df"))
  }

  /** One PII pattern for [[redactPii]]: output-column suffix, the regex
    * (kept to syntax Java regex and RE2 evaluate identically — character
    * classes, bounded repeats, ASCII `\b`; no backrefs or lookaround, so a
    * DuckDB oracle replays counts and replacements bit-for-bit), and the
    * replacement token.
    */
  final case class PiiPattern(name: String, regex: String, token: String)

  /** Default detector battery: emails, NANP-style dashed phone numbers,
    * dotted-quad IPv4 literals.
    */
  val DefaultPiiPatterns: Seq[PiiPattern] = Seq(
    PiiPattern("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    PiiPattern("phone", "\\b[0-9]{3}-[0-9]{3}-[0-9]{4}\\b", "<PHONE>"),
    PiiPattern("ip", "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b", "<IP>"))

  /** PII scrub (the redaction pass a training corpus runs before anything
    * leaves the pipeline): count and mask each pattern in sequence —
    * pattern i+1 is counted on the text with patterns ≤ i already masked,
    * so overlapping hits are attributed to exactly one detector and the
    * counts always agree with the final text. A pure corpus-linear
    * projection (no shuffle, no UDF); each intermediate redaction is a
    * separately staged alias so the regex subtree evaluates once per stage
    * even though the next stage references it twice (count + replace) —
    * the CollapseProject lesson from the quality-rule battery.
    * Output: (id, n_<name> per pattern..., clean_text).
    */
  def redactPii(
      df: DataFrame,
      idCol: String,
      textCol: String,
      patterns: Seq[PiiPattern] = DefaultPiiPatterns): DataFrame = {
    require(patterns.nonEmpty, "at least one pattern")
    val seeded = df.select(col(idCol), col(textCol).as("_t0"))
    val (redacted, _) = patterns.zipWithIndex.foldLeft((seeded, "_t0")) {
      case ((acc, cur), (p, i)) =>
        val next = s"_t${i + 1}"
        val stage = acc.select(
          (acc.columns.filterNot(_ == cur).map(col) :+
            regexp_count(col(cur), lit(p.regex)).cast("long").as(s"n_${p.name}") :+
            regexp_replace(col(cur), p.regex, p.token).as(next)): _*)
        (stage, next)
    }
    redacted.select(
      (col(idCol) +:
        patterns.map(p => col(s"n_${p.name}")) :+
        col(s"_t${patterns.size}").as("clean_text")): _*)
  }

  /** Checksum-gated card redaction — the PII tier's PRECISION upgrade
    * over [[redactPii]]'s pattern-only masking: every 13-19-digit run
    * (spaces/hyphens allowed) is extracted, but only runs passing the
    * Luhn checksum ([[graft.functions.LuhnCheck]], a codegen'd native
    * expression) are masked. Random digit runs (timestamps, invoice
    * ids) pass Luhn only 1-in-10, so the false-positive mass drops ~90 %
    * while no real card number survives. Pure scan-level projection:
    * extract-all → HOF filter (the Luhn check inlines into codegen) →
    * fold of replaces. Output: (id, n_cards, clean_text).
    */
  def redactCards(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    graft.functions.LuhnCheck.register(df.sparkSession)
    df.select(
        col(idCol),
        col(textCol).as("__t"),
        expr(s"filter(regexp_extract_all($textCol, '[0-9][0-9 -]{11,21}[0-9]', 0), " +
          "r -> luhn_check(r))").as("__cards"))
      .select(
        col(idCol),
        size(col("__cards")).cast("long").as("n_cards"),
        expr("aggregate(__cards, __t, (acc, r) -> replace(acc, r, '[CARD]'))")
          .as("clean_text"))
  }

  /** w-shingle fingerprint table: per document the distinct/total shingle
    * counts plus the shingle fingerprint array (xxhash64 of each w-token
    * window — the rolling-hash document-fingerprint shape). The hash
    * values are for library use (winnowing, containment); the counts are
    * engine-neutral.
    * Output: (id, n_shingles, n_distinct_shingles, fingerprints).
    */
  def shingleFingerprints(df: DataFrame, idCol: String, textCol: String, w: Int): DataFrame = {
    val t = toks(col(textCol))
    // guard: Spark's sequence(0, n) DESCENDS for n < 0 rather than being
    // empty, so short docs need an explicit empty array
    val shingles = when(
      size(t) >= w,
      transform(
        sequence(lit(0), size(t) - w),
        i => concat_ws(" ", slice(t, i + 1, lit(w)))))
      .otherwise(array().cast("array<string>"))
    df.select(col(idCol), shingles.as("sh"))
      .select(
        col(idCol),
        size(col("sh")).cast("long").as("n_shingles"),
        size(array_distinct(col("sh"))).cast("long").as("n_distinct_shingles"),
        transform(col("sh"), s => xxhash64(s)).as("fingerprints"))
  }

  /** Vocabulary growth curve (Heaps' law empirics): how many NEW distinct
    * tokens each ingest checkpoint contributes and the cumulative
    * vocabulary after it — the curve that says whether a corpus slice
    * still adds lexical coverage or only repeats (diminishing new-token
    * yield ⇒ dedup/quality passes matter more than more data).
    *
    * Scale shape: one explode + `min(idCol)` per token (map-side
    * combined — each token's FIRST document decides which checkpoint
    * introduced it), a |vocab|-row bucket agg, and a cumulative window
    * over `checkpoints` rows. The raw corpus is scanned once.
    * Output: (checkpoint, new_tokens, vocab_size), checkpoint 0..k−1 by
    * equal id ranges.
    */
  def vocabularyGrowth(
      items: DataFrame, // (idCol, itemCol) — token/gram occurrences
      idCol: String,
      itemCol: String,
      checkpoints: Int): DataFrame = {
    require(checkpoints >= 1)
    val maxId = items.agg(max(col(idCol))).head().getLong(0)
    val per = maxId / checkpoints + 1
    val firstSeen = items
      .groupBy(col(itemCol))
      .agg(min(col(idCol)).as("first_doc"))
      .withColumn("checkpoint", expr(s"first_doc div ${per}L"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy("checkpoint")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    firstSeen
      .groupBy("checkpoint")
      .agg(count(lit(1)).as("new_tokens"))
      .withColumn("vocab_size", sum("new_tokens").over(w))
  }
}
