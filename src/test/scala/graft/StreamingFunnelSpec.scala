package graft

import org.apache.spark.sql.functions._

import graft.operators.Funnel
import graft.streaming.StreamingFunnel

/** The streamed funnel must equal the batch funnel under time-ordered
  * replay, including completions that SPAN micro-batches (the keyed
  * state carrying earlier steps forward).
  */
class StreamingFunnelSpec extends SparkSpec {
  init()
  import spark.implicits._

  private val steps = Seq("a", "b", "c")

  test("streamed == batch across chunkings, with cross-batch completions") {
    // u1's steps land at t=10/500/900 — with 4 time-range chunks over
    // [10,1000] each step arrives in a DIFFERENT micro-batch
    val events = Seq(
      (1L, 10L, "a"), (1L, 500L, "b"), (1L, 900L, "c"),
      (2L, 20L, "a"), (2L, 15L, "b"), // b before a: never advances
      (3L, 100L, "a"), (3L, 950L, "b"), // window 600: b too late
      (4L, 1000L, "x")) // non-step event ignored
      .toDF("user_id", "tus", "event_type")
    val batch = Funnel.analyze(events, "user_id", "tus", "event_type", steps, windowUs = 600L)
      .orderBy("user_id").collect().toSeq
    for (chunks <- Seq(1, 4)) {
      val streamed = StreamingFunnel
        .run(events, "user_id", "tus", "event_type", steps, windowUs = 600L, chunks = chunks)
        .orderBy("user_id").collect().toSeq
      assert(streamed == batch, s"chunks=$chunks diverged:\n$streamed\nvs\n$batch")
    }
    assert(batch.size == 3)
  }

  test("streamed == batch on real events at 3 chunkings") {
    val ev = core.Tables(spark, sfSmoke, "events")
      .withColumn("tus", unix_micros(col("ts")))
    val batch = Funnel.analyze(ev, "user_id", "tus", "event_type",
      Seq("signup", "view", "click"), windowUs = 86400000000L)
      .orderBy("user_id").collect().toSeq
    for (chunks <- Seq(2, 5)) {
      val streamed = StreamingFunnel.run(ev, "user_id", "tus", "event_type",
        Seq("signup", "view", "click"), windowUs = 86400000000L, chunks = chunks)
        .orderBy("user_id").collect().toSeq
      assert(streamed == batch, s"chunks=$chunks diverged")
    }
    assert(batch.nonEmpty)
  }
}
