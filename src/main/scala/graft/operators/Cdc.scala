package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Change-data-capture MERGE — the lakehouse upsert/delete primitive
  * (Delta/Iceberg `MERGE INTO`, Hudi upsert) as a plain two-relation
  * operator: a base snapshot plus a changelog of keyed
  * upsert/delete records produces the next snapshot. The inverse of
  * [[SnapshotDiff]] — [[changelog]] extracts the minimal changelog
  * between two snapshots, and `applyChangelog(old, changelog(old, new))
  * == new` is the round-trip law the spec pins.
  *
  * Winner semantics: per key the change with the greatest
  * `(seq, op, values…)` struct wins — seq first (the LSN / commit
  * timestamp), then the lexicographic tail as a DETERMINISTIC total
  * tiebreak for pathological duplicate seqs ('upsert' > 'delete', so a
  * same-seq upsert outranks a same-seq delete; real changelogs have
  * unique seqs per key and never reach the tail). A winning delete
  * removes the key; a winning upsert replaces (or inserts) the value
  * columns; keys absent from the changelog carry their base row
  * untouched. Deleting an absent key is a no-op.
  *
  * Scale shape: the winner reduction is ONE map-side-combinable
  * `max(struct(…))` aggregation — the changelog never sorts, never
  * windows; the merge is a single full-outer hash join on the key,
  * co-partitioned with the aggregation's own exchange. At 100 TB this
  * is the minimal MERGE plan: one shuffle of the (deduplicated)
  * changelog + one shuffle of the base, both AQE-sized, no driver
  * state. Works identically when `base` is empty (bootstrap-from-log)
  * or when `changes` is empty (identity).
  */
object Cdc {

  /** Apply a changelog to a base snapshot. `changes` carries
    * (keyCol, seqCol, opCol, valueCols…) with op ∈ {'upsert', deleteOp};
    * output is (keyCol, valueCols…) — the next snapshot.
    */
  def applyChangelog(
      base: DataFrame,
      changes: DataFrame,
      keyCol: String,
      seqCol: String,
      opCol: String,
      valueCols: Seq[String],
      deleteOp: String = "delete"): DataFrame = {
    require(valueCols.nonEmpty, "applyChangelog needs at least one value column")
    val winner = changes
      .groupBy(col(keyCol))
      .agg(max(struct((Seq(seqCol, opCol) ++ valueCols).map(col): _*)).as("__w"))
      .select(
        col(keyCol),
        col(s"__w.$opCol").as("__op"),
        struct(valueCols.map(c => col(s"__w.$c").as(c)): _*).as("__c"))
    val b = base.select(col(keyCol), struct(valueCols.map(col): _*).as("__b"))
    b.join(winner, Seq(keyCol), "full_outer")
      .filter(col("__c").isNull || col("__op") =!= deleteOp)
      .select(
        col(keyCol) +:
          valueCols.map(c =>
            when(col("__c").isNotNull, col(s"__c.$c"))
              .otherwise(col(s"__b.$c")).as(c)): _*)
  }

  /** Log compaction — Kafka's compacted-topic semantics as an operator:
    * keep only each key's WINNING change (the same `(seq, op, values…)`
    * struct order [[applyChangelog]] resolves by), dropping every
    * superseded record. The contract is an algebraic LAW the spec pins:
    * `applyChangelog(base, log) == applyChangelog(base, compact(log))`
    * for EVERY base — so compaction can run any time, on any prefix
    * boundary, without changing a single downstream snapshot. One
    * map-side-combinable max(struct) aggregation; output is key-grain
    * (≤ one row per key) whatever the log length — the state-bounding
    * step a long-lived changelog needs. Output: (keyCol, seqCol, opCol,
    * valueCols…) with the winner's seq preserved (re-compaction and
    * later merges keep ordering against fresh changes).
    */
  def compact(
      changes: DataFrame,
      keyCol: String,
      seqCol: String,
      opCol: String,
      valueCols: Seq[String]): DataFrame = {
    require(valueCols.nonEmpty, "compact needs at least one value column")
    changes
      .groupBy(col(keyCol))
      .agg(max(struct((Seq(seqCol, opCol) ++ valueCols).map(col): _*)).as("__w"))
      .select(
        col(keyCol) +:
          (Seq(seqCol, opCol) ++ valueCols).map(c => col(s"__w.$c").as(c)): _*)
  }

  /** Minimal changelog between two snapshots: (keyCol, op, valueCols…)
    * with op ∈ {'upsert', 'delete'} — upsert for keys only in `newDf` or
    * present in both with different content (new values ride along),
    * delete (NULL values) for keys only in `oldDf`; unchanged keys are
    * ABSENT. Content equality is the [[SnapshotDiff]] digest (engine-
    * portable MD5 over the value columns, 0x01-joined), so the changelog
    * shuffle moves digests, not documents, until the final value
    * projection. `applyChangelog(oldDf, changelog(oldDf, newDf), …)`
    * reproduces `newDf` exactly (any constant seq works — op alone
    * decides, one change per key by construction).
    */
  def changelog(
      oldDf: DataFrame,
      newDf: DataFrame,
      keyCol: String,
      valueCols: Seq[String]): DataFrame = {
    require(valueCols.nonEmpty, "changelog needs at least one value column")
    // NULL-distinct per-column encoding: a NULL field digests as 0x00 and a
    // value digests as 'v'+value, so (a, NULL) and (NULL, a) differ --
    // concat_ws alone would silently SKIP the NULL field and collapse them,
    // breaking the applyChangelog(old, changelog(old,new)) == new law.
    def digest = md5(concat_ws("\u0001", valueCols.map(c =>
      coalesce(concat(lit("v"), col(c).cast("string")), lit("\u0000"))): _*))
    val o = oldDf.select(col(keyCol), digest.as("__od"))
    val n = newDf.select(
      col(keyCol) +: (digest.as("__nd") +: valueCols.map(col)): _*)
    o.join(n, Seq(keyCol), "full_outer")
      .filter(col("__od").isNull || col("__nd").isNull || col("__od") =!= col("__nd"))
      .select(
        col(keyCol) +:
          (when(col("__nd").isNull, lit("delete")).otherwise(lit("upsert")).as("op") +:
            valueCols.map(col)): _*)
  }
}
