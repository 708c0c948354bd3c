package graft

import org.apache.spark.sql.functions._

import graft.operators.CountMin
import graft.streaming.StreamingCountMin

/** The streamed sketch must equal the batch sketch whatever the batch
  * boundaries — the associativity contract that lets q84's oracle skip
  * streaming entirely.
  */
class StreamingCountMinSpec extends SparkSpec {
  init()
  import spark.implicits._

  test("empty input yields an empty sketch, not an NPE") {
    val empty = Seq.empty[(Long, String)].toDF("ck", "item")
    val got = StreamingCountMin.runSketch(empty, "item", "ck", depth = 3, width = 64, chunks = 2)
    assert(got.count() == 0L)
    assert(got.columns.toSeq == Seq("r", "cell", "cnt"))
  }

  test("streamed sketch == batch sketch across chunkings") {
    val items = (0 until 400)
      .map(i => (i.toLong, s"tok${i % 13}"))
      .toDF("ck", "item")
    val batch = CountMin.sketch(items, "item", depth = 3, width = 64)
      .orderBy("r", "cell").as[(Int, Long, Long)].collect().toSeq
    for (chunks <- Seq(1, 4)) {
      val streamed = StreamingCountMin
        .runSketch(items, "item", "ck", depth = 3, width = 64, chunks = chunks)
        .orderBy("r", "cell").as[(Int, Long, Long)].collect().toSeq
      assert(streamed == batch, s"chunks=$chunks diverged")
    }
  }
}
