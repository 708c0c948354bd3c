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
}
