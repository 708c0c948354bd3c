package graft

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.operators.{Chunking, Packing, SnapshotDiff}

/** Chunking (overlapping retrieval spans), SnapshotDiff (CDC), and
  * Packing.trainingOrder (deterministic loader layout).
  */
class CurationOpsSpec extends SparkSpec {
  init()

  private lazy val docs = Tables(spark, sfSmoke, "documents")

  // ---------------------------------------------------------------- chunking

  test("chunking: spans tile every document with the declared overlap") {
    import spark.implicits._
    val width = 8L
    val stride = 5L
    val df = Seq(
      (1L, (1 to 23).map(i => s"w$i").mkString(" ")), // 23 toks → 4 chunks
      (2L, "a b c"), //  3 toks → 1 chunk
      (3L, "solo"), //  1 tok  → 1 chunk
      (4L, "   "), //  0 toks → no chunks
      (5L, (1 to 8).map(i => s"x$i").mkString(" "))) //  8 toks → exactly 1
      .toDF("doc_id", "text")
    val out = Chunking.chunkSpans(df, "doc_id", "text", width, stride)
      .orderBy("doc_id", "chunk")
      .as[(Long, Long, Long, Long, Long, String)].collect()

    // doc 4 (whitespace only) yields nothing
    assert(!out.exists(_._1 == 4L))
    // doc 1: starts 0,5,10,15 — ceil((23-8)/5)=3 extra chunks
    val d1 = out.filter(_._1 == 1L)
    assert(d1.map(_._3).toSeq == Seq(0L, 5L, 10L, 15L), d1.mkString(","))
    assert(d1.map(_._4).toSeq == Seq(8L, 13L, 18L, 23L))
    // every chunk's text is exactly its token slice
    assert(d1.head._6 == (1 to 8).map(i => s"w$i").mkString(" "))
    assert(d1.last._6 == (16 to 23).map(i => s"w$i").mkString(" "))
    // short docs: a single chunk covering everything
    assert(out.filter(_._1 == 2L).map(r => (r._3, r._4)).toSeq == Seq((0L, 3L)))
    assert(out.filter(_._1 == 5L).map(r => (r._3, r._4)).toSeq == Seq((0L, 8L)))
    // coverage + overlap: consecutive chunks overlap by width - stride
    d1.sliding(2).foreach { case Array(a, b) =>
      assert(b._3 == a._3 + stride && a._4 - b._3 == width - stride)
    }
  }

  test("chunking: every token position is covered by some chunk") {
    val out = Chunking.chunkSpans(docs, "doc_id", "text", width = 64, stride = 48)
    // max tok_end per doc == token count, min tok_start == 0, and no gap:
    // consecutive starts step by exactly stride so cover is contiguous
    val bad = out
      .groupBy("doc_id")
      .agg(
        min("tok_start").as("mn"),
        max("tok_end").as("mx"),
        count(lit(1)).as("nc"),
        max("chunk").as("mc"))
      .join(
        docs.select(col("doc_id"),
          size(filter(split(col("text"), " "), t => length(t) > 0)).cast("long").as("ntok")),
        "doc_id")
      .filter(col("mn") =!= 0L || col("mx") =!= col("ntok") || col("nc") =!= col("mc") + 1)
    assert(bad.isEmpty, bad.collect().take(3).mkString(","))
  }

  test("chunking: plan is shuffle-free (narrow scan → generate → project)") {
    val out = Chunking.chunkSpans(docs, "doc_id", "text", width = 64, stride = 48)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  // ------------------------------------------------------------ snapshot diff

  test("snapshot diff: classifies added/removed/changed/unchanged exactly") {
    import spark.implicits._
    val oldSnap = Seq(
      (1L, "alpha"), (2L, "beta"), (3L, "gamma"), (4L, "delta"))
      .toDF("id", "text")
    val newSnap = Seq(
      (1L, "alpha"), (2L, "beta v2"), (5L, "epsilon"), (4L, "delta"))
      .toDF("id", "text")
    val got = SnapshotDiff.diff(oldSnap, newSnap, "id", Seq("text"))
      .as[(Long, String)].collect().toMap
    assert(got == Map(
      1L -> "unchanged", 2L -> "changed", 3L -> "removed",
      4L -> "unchanged", 5L -> "added"))
  }

  test("snapshot diff: multi-column content, any column's change flags") {
    import spark.implicits._
    val o = Seq((1L, "t", "en"), (2L, "t", "en")).toDF("id", "text", "lang")
    val n = Seq((1L, "t", "de"), (2L, "t", "en")).toDF("id", "text", "lang")
    val got = SnapshotDiff.diff(o, n, "id", Seq("text", "lang"))
      .as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "changed", 2L -> "unchanged"))
  }

  test("snapshot diff: identical snapshots are all unchanged; shuffle is digest-width") {
    val d = SnapshotDiff.diff(docs, docs, "doc_id", Seq("text", "lang", "source"))
    assert(d.filter(col("status") =!= "unchanged").isEmpty)
    // the digest must be computed BELOW the exchange (projection before
    // shuffle — the shuffle then carries (id, 32-hex digest), not text):
    // in the printed tree a parent prints before its child, so every md5
    // must appear after the first Exchange
    val plan = d.queryExecution.executedPlan.toString
    val exIdx = plan.indexOf("Exchange")
    val md5Idx = plan.indexOf("md5")
    assert(exIdx > 0 && md5Idx > exIdx,
      s"digest not pushed below the shuffle (Exchange@$exIdx md5@$md5Idx):\n$plan")
  }

  // ----------------------------------------------------------- training order

  test("training order: positions are a per-shard permutation, deterministic") {
    import spark.implicits._
    val out = Packing.trainingOrder(docs, "doc_id", nShards = 16)
    // every row assigned, shard in range
    assert(out.count() == docs.count())
    assert(out.filter(col("shard") < 0 || col("shard") >= 16).isEmpty)
    // positions within each shard are 1..n with no holes
    val per = out.groupBy("shard")
      .agg(count(lit(1)).as("n"), min("pos").as("mn"), max("pos").as("mx"),
        count_distinct(col("pos")).as("nd"))
      .filter(col("mn") =!= 1L || col("mx") =!= col("n") || col("nd") =!= col("n"))
    assert(per.isEmpty, per.collect().mkString(","))
    // re-run identical (hash order, no RNG)
    val again = Packing.trainingOrder(docs, "doc_id", nShards = 16)
    assert(out.exceptAll(again).isEmpty && again.exceptAll(out).isEmpty)
  }

  test("training order: ingest-stability — new records never reorder a shard's existing relative order") {
    import spark.implicits._
    val half = docs.filter(col("doc_id") % 2 === 0)
    val full = Packing.trainingOrder(docs, "doc_id", 8)
      .filter(col("doc_id") % 2 === 0)
    val part = Packing.trainingOrder(half, "doc_id", 8)
    // relative order within a shard is preserved: sort both by (shard, pos)
    // and compare the doc_id sequences per shard
    def seqs(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("shard", "pos").select("shard", "doc_id")
        .as[(Long, Long)].collect().groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    assert(seqs(full) == seqs(part))
  }
}
