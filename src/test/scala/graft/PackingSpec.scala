package graft

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.operators.Packing

class PackingSpec extends SparkSpec {
  init()

  private lazy val docs = Tables(spark, sfSmoke, "documents")

  test("pack spans: contiguous within stream, exact token accounting") {
    val spans = Packing.packSpans(docs, "doc_id", "text", budget = 64, nStreams = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    // within each stream, doc i+1 starts exactly where doc i ended
    spans.groupBy(_._2).foreach { case (_, rows) =>
      val ordered = rows.sortBy(_._1)
      ordered.sliding(2).foreach {
        case Array((_, _, n, start, _, _), (_, _, _, start2, _, _)) =>
          assert(start2 == start + n)
        case _ => ()
      }
      assert(ordered.head._4 == 0L) // first doc starts the stream
    }
    // pack ids are the integer windows the token span overlaps
    spans.foreach { case (_, _, n, start, first, last) =>
      assert(first == start / 64)
      assert(last == (start + math.max(n, 1) - 1) / 64)
      assert(last >= first)
    }
  }

  test("pack manifest: interior packs exactly full, totals conserved") {
    val budget = 64L
    val m = Packing.packManifest(docs, "doc_id", "text", budget, nStreams = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val lastPack = m.groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
    m.foreach { case (stream, pack, nDocs, fill) =>
      assert(nDocs > 0)
      if (pack < lastPack(stream)) assert(fill == budget, s"stream $stream pack $pack: $fill")
      else assert(fill <= budget)
    }
    // every token lands in exactly one pack slot: Σ fill == Σ n_tokens
    val totalFill = m.map(_._4).sum
    val totalTok = Packing.packSpans(docs, "doc_id", "text", budget, 4)
      .agg(sum("n_tokens")).collect()(0).getLong(0)
    assert(totalFill == totalTok)
  }

  test("streams are independent: adding a stream's docs never moves another stream's packs") {
    // drop every doc of stream 0 — streams 1..3 must pack identically
    val subset = docs.filter(pmod(col("doc_id"), lit(4)) =!= 0)
    val full = Packing.packSpans(docs, "doc_id", "text", 64, 4)
      .filter(col("stream") =!= 0)
    val part = Packing.packSpans(subset, "doc_id", "text", 64, 4)
    assert(full.exceptAll(part).isEmpty && part.exceptAll(full).isEmpty)
  }

  test("epoch orders: valid layout per epoch, decorrelated across epochs, deterministic") {
    import spark.implicits._
    val docs = (1L to 400L).toDF("doc_id")
    val e1 = Packing.epochOrder(docs, "doc_id", 8, 1)
    val e2 = Packing.epochOrder(docs, "doc_id", 8, 2)
    // every doc appears once per epoch; positions are dense 1..|shard|
    assert(e1.count() == 400 && e2.count() == 400)
    assert(e1.select("doc_id").distinct().count() == 400)
    val dense = e1.groupBy("shard").agg(
      org.apache.spark.sql.functions.max("pos").as("mx"),
      org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)).as("n"))
    assert(dense.filter(col("mx") =!= col("n")).isEmpty)
    // epochs genuinely re-permute: most docs change (shard, pos)
    val same = e1.as("a").join(e2.as("b"), "doc_id")
      .filter(col("a.shard") === col("b.shard") && col("a.pos") === col("b.pos"))
      .count()
    assert(same < 40, s"epochs look correlated: $same/400 rows kept identical placement")
    // re-derivable with no stored state
    assert(Packing.epochOrder(docs, "doc_id", 8, 1).exceptAll(e1).isEmpty)
  }
}
