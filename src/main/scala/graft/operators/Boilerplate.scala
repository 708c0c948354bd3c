package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** C4-style frequent-line boilerplate removal (Raffel et al. 2020, §2.2:
  * lines occurring ≥ 3 times in the corpus were dropped; CCNet and
  * RefinedWeb apply the same per-domain): navigation bars, cookie
  * banners, and footer chrome repeat VERBATIM across pages of a site, so
  * a line seen in many distinct documents of the same source is template,
  * not content. This is the LINE-grain sibling of the repo's
  * token-shingle [[SubstringDedup]] (repeated spans) and asymmetric
  * [[SimilarityJoin.containmentJoin]] — cheaper than both (no shingling,
  * no signatures) and the first filter a crawl pipeline runs.
  *
  * Lines are literal-delimiter segments, trimmed; empty segments are
  * ignored. A line counts once per (source, doc) no matter how often it
  * repeats inside the doc, so intra-doc repetition cannot promote a line
  * to boilerplate (that is [[SubstringDedup]]'s job).
  *
  * Scale shape: explode to line grain (narrow), one dedup shuffle on
  * (source, doc, line), one map-side-combinable count on (source, line),
  * one line-grain join back, one per-doc reassembly groupBy — per-doc
  * state bounded by document size (the chunking contract). No windows,
  * nothing corpus-grain in a single task. The frequent-line relation is
  * NOT assumed broadcastable: at 100 TB a large site's template set alone
  * can pass the broadcast threshold, so the probe is a plain shuffle
  * equi-join Catalyst may still choose to broadcast when small.
  */
object Boilerplate {

  private def segments(docs: DataFrame, idCol: String, textCol: String,
      sourceCol: String, delim: String) = {
    require(delim.nonEmpty, "delimiter must be non-empty")
    docs
      .select(
        col(sourceCol).as("source"),
        col(idCol).as("id"),
        posexplode(split(col(textCol), java.util.regex.Pattern.quote(delim)))
          .as(Seq("pos", "raw")))
      .select(col("source"), col("id"), col("pos"), trim(col("raw")).as("line"))
      .filter(length(col("line")) > 0)
  }

  /** The template inventory: (source, line, n_docs) for every line
    * appearing in ≥ minDocs DISTINCT documents of the same source.
    */
  def frequentLines(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      sourceCol: String,
      delim: String,
      minDocs: Long): DataFrame = {
    require(minDocs >= 2, s"minDocs must be >= 2: $minDocs")
    segments(docs, idCol, textCol, sourceCol, delim)
      .dropDuplicates("source", "id", "line")
      .groupBy("source", "line")
      .agg(count(lit(1)).as("n_docs"))
      .filter(col("n_docs") >= minDocs)
  }

  /** Remove every occurrence of a frequent line and reassemble each
    * document's surviving lines in original order (canonically joined
    * with '\n' — trimming already made the original byte stream
    * unrecoverable). Every input document appears in the output: fully
    * templated docs come back with empty text, docs with no non-empty
    * lines pass through unchanged at n_lines = 0.
    * Output: (id, n_lines, n_removed, text_clean).
    */
  def removeLines(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      sourceCol: String,
      delim: String,
      minDocs: Long): DataFrame = {
    val freq = frequentLines(docs, idCol, textCol, sourceCol, delim, minDocs)
      .select(col("source"), col("line"), lit(1).as("__bp"))
    val rebuilt = segments(docs, idCol, textCol, sourceCol, delim)
      .join(freq, Seq("source", "line"), "left")
      .groupBy("id")
      .agg(
        count(lit(1)).as("n_lines"),
        sum(when(col("__bp").isNotNull, 1L).otherwise(0L)).as("n_removed"),
        // collect_list drops the nulls `when` leaves on removed lines;
        // array_sort on (pos, line) structs restores original order
        array_join(
          transform(
            array_sort(collect_list(
              when(col("__bp").isNull, struct(col("pos"), col("line"))))),
            x => x.getField("line")),
          "\n").as("text_clean"))
    docs
      .select(col(idCol).as("id"))
      .join(rebuilt, Seq("id"), "left")
      .select(
        col("id"),
        coalesce(col("n_lines"), lit(0L)).as("n_lines"),
        coalesce(col("n_removed"), lit(0L)).as("n_removed"),
        coalesce(col("text_clean"), lit("")).as("text_clean"))
  }
}
