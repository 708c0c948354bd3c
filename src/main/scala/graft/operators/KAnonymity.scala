package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-anonymity suppression over quasi-identifier columns — the second
  * privacy-tier operator next to [[TextAnalysis.redactPii]]: PII redaction
  * removes DIRECT identifiers from text, while rare quasi-identifier
  * COMBINATIONS (language × source, nation × segment, …) can still single
  * out an individual or a provenance a trained model may memorize.
  * Sweeney's k-anonymity (2002): every released QI combination must cover
  * at least `k` rows; combinations below `k` are suppressed (QI values
  * replaced by NULL — the all-column generalization step of the standard
  * hierarchy, which is the only hierarchy-free, schema-agnostic move).
  *
  * Scale shape: one map-side-combinable census over the QI columns (output
  * is combination-sized, orders of magnitude below the data), broadcast
  * back for the per-row decision — the corpus itself never shuffles, so at
  * 100 TB this is one scan plus a broadcast hash probe per row. The census
  * relation is the auditable artifact (how many combos, how many rows
  * suppressed) a release review signs off on.
  */
object KAnonymity {

  /** Per-combination census: (qiCols…, n, keep) with `keep = n ≥ k`.
    * NULL QI values group as values (SQL GROUP BY semantics) — an
    * already-suppressed row keeps counting toward the NULL combo.
    */
  def census(df: DataFrame, qiCols: Seq[String], k: Long): DataFrame = {
    require(qiCols.nonEmpty, "census needs at least one quasi-identifier column")
    require(k >= 1, s"census: k must be >= 1, got $k")
    df.groupBy(qiCols.map(col): _*)
      .agg(count(lit(1)).as("n"))
      .withColumn("keep", col("n") >= k)
  }

  /** The suppressed release: every row of `df` with its QI columns nulled
    * when their combination covers fewer than `k` rows, plus `qi_n` (the
    * combination's census count — the anonymity set size a row ships
    * with). Non-QI columns always pass through untouched.
    */
  def suppress(df: DataFrame, qiCols: Seq[String], k: Long): DataFrame =
    suppressWith(df, qiCols, census(df, qiCols, k), Seq("n" -> "qi_n"))

  /** Distinct-l-diversity census (Machanavajjhala et al. 2006): a combo
    * that clears `k` rows can still leak its sensitive attribute if those
    * rows all SHARE one sensitive value (the homogeneity attack — "every
    * patient in this ZIP+age cell has cancer"). `keep` additionally
    * requires ≥ `l` distinct values of `sensCol` inside the combo.
    * Output: (qiCols…, n, n_sens, keep). Same scale shape as [[census]]
    * — one map-side-combinable aggregation (count_distinct plans as the
    * two-level partial aggregate), combination-sized output.
    */
  def diversityCensus(
      df: DataFrame,
      qiCols: Seq[String],
      sensCol: String,
      k: Long,
      l: Long): DataFrame = {
    require(qiCols.nonEmpty, "diversityCensus needs at least one quasi-identifier column")
    require(!qiCols.contains(sensCol), s"sensitive column $sensCol cannot be a QI")
    require(k >= 1 && l >= 1, s"diversityCensus: k and l must be >= 1, got k=$k l=$l")
    df.groupBy(qiCols.map(col): _*)
      .agg(
        count(lit(1)).as("n"),
        count_distinct(col(sensCol)).as("n_sens"))
      .withColumn("keep", col("n") >= k && col("n_sens") >= l)
  }

  /** The l-diverse release: QI columns nulled unless the combination has
    * ≥ `k` rows AND ≥ `l` distinct sensitive values. Ships `qi_n` and
    * `qi_nsens` so a release review can audit WHICH gate suppressed.
    */
  def suppressDiverse(
      df: DataFrame,
      qiCols: Seq[String],
      sensCol: String,
      k: Long,
      l: Long): DataFrame =
    suppressWith(
      df, qiCols, diversityCensus(df, qiCols, sensCol, k, l),
      Seq("n" -> "qi_n", "n_sens" -> "qi_nsens"))

  /** Shared release core: null-safe join of the data against a
    * combination-sized census carrying a `keep` flag. Null-safe keys: a
    * row whose QI is already NULL must still find its census combo (a
    * plain equi-join drops NULL keys on the floor). The census is
    * broadcast so the data side stays a scan (Catalyst would often pick
    * this anyway; the hint makes the 100-TB plan unconditional).
    *
    * EVERY census column is renamed to a reserved `__kanon_`-prefixed
    * name before the join — not just the QI keys: a table that
    * legitimately carries columns named `n`/`keep`/`n_sens` would
    * otherwise make `col("keep")` ambiguous and fail analysis (ADVICE
    * r10). `auditCols` are (censusName → outputName) pairs resolved
    * against the renamed side.
    */
  private def suppressWith(
      df: DataFrame,
      qiCols: Seq[String],
      censusDf: DataFrame,
      auditCols: Seq[(String, String)]): DataFrame = {
    val c = censusDf.columns.foldLeft(censusDf) { (d, q) =>
      d.withColumnRenamed(q, s"__kanon_$q")
    }
    val cond = qiCols.map(q => col(q) <=> col(s"__kanon_$q")).reduce(_ && _)
    val joined = df.join(broadcast(c), cond)
    val out = df.columns.toSeq.map {
      case q if qiCols.contains(q) =>
        when(col("__kanon_keep"), col(q))
          .otherwise(lit(null).cast(df.schema(q).dataType)).as(q)
      case o => col(o)
    } ++ auditCols.map { case (from, to) => col(s"__kanon_$from").as(to) }
    joined.select(out: _*)
  }
}
