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
  def suppress(df: DataFrame, qiCols: Seq[String], k: Long): DataFrame = {
    // null-safe join keys: a row whose QI is already NULL must still find
    // its census combo (plain equi-join drops NULL keys on the floor)
    val c = qiCols.foldLeft(census(df, qiCols, k)) { (d, q) =>
      d.withColumnRenamed(q, s"__qi_$q")
    }
    val cond = qiCols.map(q => col(q) <=> col(s"__qi_$q")).reduce(_ && _)
    // the census is combination-sized — broadcast it so the data side
    // stays a scan (Catalyst would often pick this anyway; the hint makes
    // the 100-TB plan unconditional)
    val joined = df.join(broadcast(c), cond)
    val out = df.columns.toSeq.map {
      case q if qiCols.contains(q) =>
        when(col("keep"), col(q)).otherwise(lit(null).cast(df.schema(q).dataType)).as(q)
      case o => col(o)
    } :+ col("n").as("qi_n")
    joined.select(out: _*)
  }
}
