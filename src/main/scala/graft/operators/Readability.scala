package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Flesch reading-ease in exact integers — the classic readability
  * quality signal (Flesch 1948; a standard feature in LLM data-quality
  * scorers next to the length/punctuation ratios of
  * [[TextAnalysis]]): 206.835 − 1.015·(words/sentences) −
  * 84.6·(syllables/word), at ×1000 scale with floored divisions so
  * every engine computes the identical milli-score:
  *
  *   flesch_milli = 206835 − (1015·words) div sentences
  *                         − (84600·syllables) div words
  *
  * The surrogate counts are DEFINED (documented, engine-replayable —
  * real syllabification is dictionary work no two engines share):
  * words = non-empty whitespace tokens (the repo tokenize convention),
  * sentences = max(1, count of '.', '!' or '?' characters), syllables
  * = Σ per text of [aeiouy]+ runs in the lowercased text, floored at
  * ≥ 1 per word (an all-consonant token still costs one syllable —
  * counted globally as max(words, vowel runs)). Empty texts (0 words)
  * report NULL score rather than a fake number.
  *
  * Standard bands ship alongside (the Flesch table, at milli scale):
  * ≥ 90000 very_easy, ≥ 70000 easy, ≥ 50000 medium, ≥ 30000 hard,
  * else very_hard.
  *
  * Scale shape: pure per-row projection — regexp counts, no UDF, no
  * shuffle; whole-stage-codegen throughout.
  *
  * Output: (idCol, words, sentences, syllables, flesch_milli, band).
  */
object Readability {

  def flesch(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val base = df.select(
      col(idCol),
      size(filter(split(col(textCol), " "), t => t =!= "")).cast("long").as("words"),
      greatest(
        size(expr(s"regexp_extract_all($textCol, '[.!?]', 0)")).cast("long"),
        lit(1L)).as("sentences"),
      size(expr(s"regexp_extract_all(lower($textCol), '[aeiouy]+', 0)"))
        .cast("long").as("__runs"))
    base
      .withColumn("syllables", greatest(col("words"), col("__runs")))
      .withColumn("flesch_milli", expr(
        """CASE WHEN words = 0 THEN CAST(NULL AS BIGINT)
          |ELSE 206835 - (1015 * words) div sentences
          |            - (84600 * syllables) div words END""".stripMargin))
      .withColumn("band", expr(
        """CASE WHEN flesch_milli IS NULL THEN 'empty'
          |WHEN flesch_milli >= 90000 THEN 'very_easy'
          |WHEN flesch_milli >= 70000 THEN 'easy'
          |WHEN flesch_milli >= 50000 THEN 'medium'
          |WHEN flesch_milli >= 30000 THEN 'hard'
          |ELSE 'very_hard' END""".stripMargin))
      .drop("__runs")
  }
}
