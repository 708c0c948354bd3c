package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Cdc
import graft.streaming.StreamingCdc

class CdcSpec extends SparkSpec {
  init()

  import spark.implicits._

  private def snap(rows: (Long, String, Long)*) =
    rows.toDF("k", "name", "score")

  test("applyChangelog: max-seq winner, delete, insert, untouched, absent-delete no-op") {
    val base = snap((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L))
    val changes = Seq(
      (2L, 1L, "upsert", "b1", 21L), // superseded by seq 2
      (2L, 2L, "upsert", "b2", 22L), // winner for key 2
      (3L, 5L, "delete", null.asInstanceOf[String], 0L), // removes key 3
      (4L, 1L, "upsert", "d", 40L),  // log-only insert
      (9L, 7L, "delete", null.asInstanceOf[String], 0L)  // absent key: no-op
    ).toDF("k", "seq", "op", "name", "score")
    val got = Cdc.applyChangelog(base, changes, "k", "seq", "op", Seq("name", "score"))
      .as[(Long, String, Long)].collect().toSet
    assert(got == Set((1L, "a", 10L), (2L, "b2", 22L), (4L, "d", 40L)))
  }

  test("applyChangelog: duplicate-seq tiebreak is deterministic, upsert beats delete") {
    val base = snap((1L, "a", 10L))
    val changes = Seq(
      (1L, 5L, "delete", null.asInstanceOf[String], 0L),
      (1L, 5L, "upsert", "u", 11L) // same seq: 'upsert' > 'delete' in the struct order
    ).toDF("k", "seq", "op", "name", "score")
    val got = Cdc.applyChangelog(base, changes, "k", "seq", "op", Seq("name", "score"))
      .as[(Long, String, Long)].collect().toSet
    assert(got == Set((1L, "u", 11L)))
  }

  test("applyChangelog: empty changelog is identity; empty base bootstraps from log") {
    val base = snap((1L, "a", 10L), (2L, "b", 20L))
    val empty = Seq.empty[(Long, Long, String, String, Long)]
      .toDF("k", "seq", "op", "name", "score")
    val id = Cdc.applyChangelog(base, empty, "k", "seq", "op", Seq("name", "score"))
    assert(id.exceptAll(base).isEmpty && base.exceptAll(id).isEmpty)

    val log = Seq(
      (1L, 1L, "upsert", "x", 1L),
      (1L, 2L, "delete", null.asInstanceOf[String], 0L),
      (2L, 1L, "upsert", "y", 2L)
    ).toDF("k", "seq", "op", "name", "score")
    val boot = Cdc.applyChangelog(base.limit(0), log, "k", "seq", "op", Seq("name", "score"))
      .as[(Long, String, Long)].collect().toSet
    assert(boot == Set((2L, "y", 2L)))
  }

  test("round trip: applyChangelog(old, changelog(old, new)) == new") {
    val docs = spark.read.parquet(s"$sfSmoke/documents.parquet")
    val oldSnap = docs.filter(pmod(col("doc_id"), lit(7)) =!= 3)
      .withColumn("text",
        when(pmod(col("doc_id"), lit(5)) === 1, concat(col("text"), lit(" rev2")))
          .otherwise(col("text")))
      .select("doc_id", "text", "lang", "source")
    val newSnap = docs.filter(pmod(col("doc_id"), lit(9)) =!= 4)
      .select("doc_id", "text", "lang", "source")
    val log = Cdc.changelog(oldSnap, newSnap, "doc_id", Seq("text", "lang", "source"))
    // minimality: no entry for keys present in both with equal content
    val unchanged = oldSnap.join(newSnap, Seq("doc_id", "text", "lang", "source"))
      .select("doc_id")
    assert(log.join(unchanged, "doc_id").isEmpty)
    val applied = Cdc.applyChangelog(
      oldSnap, log.withColumn("seq", lit(0L)),
      "doc_id", "seq", "op", Seq("text", "lang", "source"))
    assert(applied.exceptAll(newSnap).isEmpty && newSnap.exceptAll(applied).isEmpty)
  }

  test("cdc TVFs round-trip the operator") {
    val docs = spark.read.parquet(s"$sfSmoke/documents.parquet")
      .select("doc_id", "text", "lang", "source")
    docs.filter(col("doc_id") % 2 === 0).createOrReplaceTempView("cdc_old")
    docs.filter(col("doc_id") % 3 =!= 1).createOrReplaceTempView("cdc_new")
    val sqlLog = spark.sql(
      "SELECT * FROM cdc_changelog('cdc_old', 'cdc_new', 'doc_id', 'text,lang,source')")
    val scalaLog = Cdc.changelog(
      spark.table("cdc_old"), spark.table("cdc_new"), "doc_id",
      Seq("text", "lang", "source"))
    assert(sqlLog.columns.toSeq == scalaLog.columns.toSeq)
    assert(sqlLog.exceptAll(scalaLog).isEmpty && scalaLog.exceptAll(sqlLog).isEmpty)

    sqlLog.withColumn("seq", lit(0L)).createOrReplaceTempView("cdc_log")
    val sqlApplied = spark.sql(
      "SELECT * FROM cdc_apply('cdc_old', 'cdc_log', 'doc_id', 'seq', 'op', 'text,lang,source')")
    val newSnap = spark.table("cdc_new")
    assert(sqlApplied.exceptAll(newSnap).isEmpty && newSnap.exceptAll(sqlApplied).isEmpty)
  }

  test("compaction law: applyChangelog(base, log) == applyChangelog(base, compact(log)) for every base") {
    val log = Seq(
      (1L, 1L, "upsert", "a1", 1L), (1L, 3L, "upsert", "a3", 3L),
      (1L, 2L, "delete", null.asInstanceOf[String], 0L),
      (2L, 1L, "upsert", "b", 2L), (2L, 4L, "delete", null.asInstanceOf[String], 0L),
      (3L, 9L, "upsert", "c", 9L),
      (4L, 2L, "delete", null.asInstanceOf[String], 0L)
    ).toDF("k", "seq", "op", "name", "score")
    val compacted = Cdc.compact(log, "k", "seq", "op", Seq("name", "score"))
    assert(compacted.count() == 4) // key-grain whatever the log length
    // the law over three different bases, incl. empty and overlapping
    val bases = Seq(
      snap(),
      snap((1L, "x", 0L), (2L, "y", 0L)),
      snap((4L, "z", 4L), (9L, "w", 9L)))
    bases.foreach { base =>
      val full = Cdc.applyChangelog(base, log, "k", "seq", "op", Seq("name", "score"))
      val comp = Cdc.applyChangelog(base, compacted, "k", "seq", "op", Seq("name", "score"))
      assert(full.exceptAll(comp).isEmpty && comp.exceptAll(full).isEmpty)
    }
    // re-compaction is idempotent
    val again = Cdc.compact(compacted, "k", "seq", "op", Seq("name", "score"))
    assert(again.exceptAll(compacted).isEmpty && compacted.exceptAll(again).isEmpty)
  }

  test("streaming IVM: view deltas are change-proportional and fold to the batch view") {
    import graft.streaming.StreamingIvmAggregate
    // batches (seq ranges of width 10):
    // b0: k1 -> (red, 5); k2 -> (blue, 3)
    // b1: k1 -> (red, 5) again  -> NO delta (cancelled)
    // b2: k1 -> (blue, 7)       -> (red, -5, -1), (blue, +7, +1)
    // b3: k2 deleted            -> (blue, -3, -1); k3 -> (red, 2)
    val changes = Seq(
      (1L, 10L, 0L, "upsert", "red", 5L),
      (2L, 11L, 0L, "upsert", "blue", 3L),
      (1L, 20L, 0L, "upsert", "red", 5L),
      (1L, 30L, 0L, "upsert", "blue", 7L),
      (2L, 39L, 0L, "delete", null.asInstanceOf[String], 0L),
      (3L, 40L, 0L, "upsert", "red", 2L)
    ).toDF("k", "seq", "tb", "op", "dim", "m")
    val deltas = StreamingIvmAggregate
      .run(changes, "k", "seq", "tb", "op", "dim", "m", chunks = 4)
      .as[(Int, String, Long, Long)].collect().toSet
    assert(deltas == Set(
      (0, "red", 5L, 1L), (0, "blue", 3L, 1L),
      (2, "red", -5L, -1L), (2, "blue", 7L, 1L),
      (3, "blue", -3L, -1L), (3, "red", 2L, 1L)))
    // fold == the batch view over the last-writer-wins snapshot
    val view = StreamingIvmAggregate.viewFromDeltas(
        spark.createDataset(deltas.toSeq).toDF("batch", "dim", "d_sum", "d_cnt"), "dim")
      .as[(String, Long, Long)].collect().toSet
    assert(view == Set(("blue", 7L, 1L), ("red", 2L, 1L)))
  }

  test("streaming CDC: deltas are minimal and fold to the batch MERGE") {
    // key 1: set a, then re-set a (no-op batch), then delete
    // key 2: set b then update to b2 across batches
    // key 3: delete of an absent key (never emits)
    // key 4: insert in the last batch
    val changes = Seq(
      (1L, 10L, 0L, "upsert", "a"),
      (2L, 11L, 0L, "upsert", "b"),
      (1L, 20L, 0L, "upsert", "a"), // same visible value: no delta
      (3L, 21L, 0L, "delete", null.asInstanceOf[String]),
      (2L, 30L, 0L, "upsert", "b2"),
      (1L, 39L, 0L, "delete", null.asInstanceOf[String]),
      (4L, 40L, 0L, "upsert", "d")
    ).toDF("k", "seq", "tb", "op", "value")
    val deltas = StreamingCdc.run(changes, "k", "seq", "tb", "op", "value", chunks = 4)
      .as[(Long, Int, String, String)].collect().toSet
    assert(deltas == Set(
      (1L, 0, "upsert", "a"),
      (2L, 0, "upsert", "b"),
      (2L, 2, "upsert", "b2"),
      (1L, 3, "delete", null),
      (4L, 3, "upsert", "d")))

    val snapshot = StreamingCdc.snapshotFromDeltas(
      spark.createDataset(deltas.toSeq).toDF("k", "batch", "op", "value"), "k", "value")
    val batchMerge = Cdc.applyChangelog(
      changes.select("k", "value").limit(0), changes, "k", "seq", "op", Seq("value"))
    assert(snapshot.exceptAll(batchMerge).isEmpty && batchMerge.exceptAll(snapshot).isEmpty)
  }

  test("changelog digests NULL placement distinctly; round-trip law holds with NULLs") {
    val oldSnap = Seq(
      (1L, "a", null.asInstanceOf[String]), // NULL-swap vs new: IS a change
      (2L, "x", "y"),                        // unchanged
      (3L, null.asInstanceOf[String], null.asInstanceOf[String]) // unchanged, all-NULL
    ).toDF("k", "c1", "c2")
    val newSnap = Seq(
      (1L, null.asInstanceOf[String], "a"),
      (2L, "x", "y"),
      (3L, null.asInstanceOf[String], null.asInstanceOf[String])
    ).toDF("k", "c1", "c2")
    val log = Cdc.changelog(oldSnap, newSnap, "k", Seq("c1", "c2"))
    assert(log.count() == 1L, "only the NULL-swapped key is a change")
    val applied = Cdc.applyChangelog(
      oldSnap, log.withColumn("seq", lit(0L)), "k", "seq", "op", Seq("c1", "c2"))
    assert(applied.exceptAll(newSnap).isEmpty && newSnap.exceptAll(applied).isEmpty)

    // SnapshotDiff shares the digest: the NULL-swap row classifies as changed
    val st = graft.operators.SnapshotDiff.diff(oldSnap, newSnap, "k", Seq("c1", "c2"))
      .as[(Long, String)].collect().toMap
    assert(st == Map(1L -> "changed", 2L -> "unchanged", 3L -> "unchanged"))
  }
}
