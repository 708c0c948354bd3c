package graft

import graft.core.Tables
import graft.operators.Packing
import graft.streaming.StreamingPacking

class StreamingPackingSpec extends SparkSpec {
  init()

  private lazy val docs = Tables(spark, sfSmoke, "documents")

  test("streaming packing equals batch packing under id-ordered replay") {
    val batch = Packing.packSpans(docs, "doc_id", "text", 64, 4)
    val stream = StreamingPacking.run(docs, "doc_id", "text", 64, 4, chunks = 3)
    assert(stream.count() == batch.count())
    assert(stream.exceptAll(batch).isEmpty && batch.exceptAll(stream).isEmpty)
  }

  test("chunking is invisible: different batch counts give identical spans") {
    // offsets must carry across batch boundaries exactly — a reset or
    // double-count would shift every later span in the stream
    val a = StreamingPacking.run(docs, "doc_id", "text", 128, 8, chunks = 2)
    val b = StreamingPacking.run(docs, "doc_id", "text", 128, 8, chunks = 5)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }
}
