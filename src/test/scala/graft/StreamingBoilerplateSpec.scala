package graft

import graft.streaming.StreamingBoilerplate

class StreamingBoilerplateSpec extends SparkSpec {
  init()
  import spark.implicits._

  // doc ids 0..7 → 4 chunks of 2 docs. "tpl" (source A) appears in docs
  // 0,2,4 → crosses minDocs=3 in batch 2; "late" appears in 1,3,5,7 →
  // crosses 3 in batch 2 as well but with n=3; "rare" appears twice.
  private def docs = Seq(
    (0L, "A", "tpl\nx0\nlate-less"),
    (1L, "A", "late\ny1"),
    (2L, "A", "tpl\nx2"),
    (3L, "A", "late\ny3"),
    (4L, "A", "tpl\nx4"),
    (5L, "A", "late\nrare"),
    (6L, "B", "tpl\nz6"),
    (7L, "A", "late\nrare")).toDF("doc_id", "source", "text")

  test("a line emits once, in the batch its distinct-doc count crosses the floor") {
    val got = StreamingBoilerplate
      .run(docs, "doc_id", "text", "source", "\n", minDocs = 3L, chunks = 4)
      .orderBy("source", "line")
      .as[(Int, String, String, Long)].collect().toSeq
    // tpl@A: docs 0,2,4 → batches 0,1,2 → promoted batch 2 with n=3
    // late@A: docs 1,3,5 → batches 0,1,2 → promoted batch 2 with n=3
    // tpl@B (1 doc), rare (2 docs), content lines: never promoted
    assert(got == Seq((2, "A", "late", 3L), (2, "A", "tpl", 3L)))
  }

  test("intra-doc repetition cannot promote: duplicate lines in one doc count once") {
    val d = Seq(
      (0L, "S", "dup\ndup\ndup"),
      (1L, "S", "dup"),
      (2L, "S", "other"),
      (3L, "S", "dup\ndup")).toDF("doc_id", "source", "text")
    val got = StreamingBoilerplate
      .run(d, "doc_id", "text", "source", "\n", minDocs = 3L, chunks = 4)
      .as[(Int, String, String, Long)].collect().toSeq
    // dup in docs 0,1,3 → batches 0,1,3 → crosses 3 at batch 3
    assert(got == Seq((3, "S", "dup", 3L)))
  }

  test("matches the batch frequentLines inventory at the end of the stream") {
    val streamed = StreamingBoilerplate
      .run(docs, "doc_id", "text", "source", "\n", 3L, chunks = 4)
      .select("source", "line").as[(String, String)].collect().toSet
    val batch = graft.operators.Boilerplate
      .frequentLines(docs, "doc_id", "text", "source", "\n", 3L)
      .select("source", "line").as[(String, String)].collect().toSet
    assert(streamed == batch)
  }
}
