package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot diff / change-data-capture between two corpus versions — the
  * incremental-curation primitive: given yesterday's corpus and today's,
  * classify every id as added / removed / changed / unchanged so the
  * expensive downstream passes (dedup, decontamination, embedding) run
  * only on the delta.
  *
  * Scale shape: each side is first reduced to (id, digest) — MD5 over the
  * content columns — so the shuffle moves 32 hex chars per row no matter
  * how wide the documents are; the full-outer join on id is then the
  * minimal possible CDC shape (one hash exchange per side, AQE-sized).
  * MD5 (not xxhash64) because it is engine-portable: the oracle replays
  * digests bit-for-bit, and a production pipeline can hand the digest
  * column to any other system without re-hashing.
  */
object SnapshotDiff {

  /** Classify ids across two snapshots. Output: (id, status) with status ∈
    * {'added', 'removed', 'changed', 'unchanged'} — added = only in `newDf`,
    * removed = only in `oldDf`, changed = in both with different content
    * digests. Content equality is digest equality over `contentCols`
    * joined with a 0x01 separator, each column NULL-distinctly encoded
    * (NULL → 0x00, value → 'v'+value) so rows differing only in NULL
    * placement digest differently (fields must not contain 0x01 —
    * true of text columns; a production caller with binary fields hashes
    * per-column and concatenates digests).
    */
  def diff(
      oldDf: DataFrame,
      newDf: DataFrame,
      idCol: String,
      contentCols: Seq[String]): DataFrame = {
    require(contentCols.nonEmpty, "diff: at least one content column")
    def digested(df: DataFrame, dcol: String): DataFrame =
      df.select(
        col(idCol),
        md5(concat_ws("\u0001", contentCols.map(c =>
          coalesce(concat(lit("v"), col(c).cast("string")), lit("\u0000"))): _*)).as(dcol))
    val o = digested(oldDf, "_old_digest")
    val n = digested(newDf, "_new_digest")
    o.join(n, Seq(idCol), "full_outer")
      .select(
        col(idCol),
        when(col("_old_digest").isNull, lit("added"))
          .when(col("_new_digest").isNull, lit("removed"))
          .when(col("_old_digest") =!= col("_new_digest"), lit("changed"))
          .otherwise(lit("unchanged"))
          .as("status"))
  }
}
