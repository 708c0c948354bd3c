package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Right-to-be-forgotten cascade (GDPR Art. 17 / CCPA deletion shape):
  * given a relation of subject keys, scrub every dependent table by its
  * subject-key column and produce the AUDIT evidence a data-protection
  * officer files — per table, how many rows existed, were removed, and
  * remain. Multi-hop cascades (customer → orders → lineitem, where the
  * grandchild carries no subject key) compose by feeding one hop's doomed
  * keys as the next hop's subjects — see q196.
  *
  * Scale shape: ONE pass per table — a left join against the
  * (deduplicated, typically broadcastable) subject relation feeds both
  * the audit aggregate and the scrub filter; no table is scanned twice,
  * no counts collect to the driver. The audit is a union of one-row
  * aggregates; the scrubbed tables come back as lazily-planned anti-joins
  * the caller writes wherever the originals live.
  */
object Forget {

  /** Deduplicated subject keys, normalized column name. */
  private def subjectKeys(subjects: DataFrame, subjectCol: String): DataFrame =
    subjects.select(col(subjectCol).as("__k")).distinct()

  /** Audit relation for scrubbing `tables` (name, df, keyCol) of every
    * row whose key appears in `subjects`: one row per table,
    * (table, n_before, n_removed, n_after), union-ordered by the caller.
    */
  def audit(
      subjects: DataFrame,
      subjectCol: String,
      tables: Seq[(String, DataFrame, String)]): DataFrame = {
    require(tables.nonEmpty, "at least one table to scrub")
    val s = subjectKeys(subjects, subjectCol).withColumn("__doomed", lit(1))
    tables.map { case (name, df, keyCol) =>
      df.select(col(keyCol).as("__k"))
        .join(s, Seq("__k"), "left")
        .agg(
          count(lit(1)).as("n_before"),
          sum(when(col("__doomed").isNotNull, 1L).otherwise(0L)).as("n_removed"))
        .select(
          lit(name).as("table"),
          coalesce(col("n_before"), lit(0L)).as("n_before"),
          coalesce(col("n_removed"), lit(0L)).as("n_removed"),
          (coalesce(col("n_before"), lit(0L)) -
            coalesce(col("n_removed"), lit(0L))).as("n_after"))
    }.reduce(_ unionByName _)
  }

  /** The scrubbed survivors of one table: an anti-join on the subject
    * key — the relation the caller persists over the original.
    */
  def scrub(
      subjects: DataFrame,
      subjectCol: String,
      df: DataFrame,
      keyCol: String): DataFrame =
    df.join(
      subjectKeys(subjects, subjectCol),
      df(keyCol) === col("__k"),
      "left_anti")
}
