package graft

import org.apache.spark.sql.functions._

import graft.operators.Scd
import graft.streaming.StreamingScd

/** Streamed SCD-2 must equal the batch history under time-ordered
  * replay, including intervals that open in one micro-batch and close in
  * a later one, and no-op changes arriving in separate batches.
  */
class StreamingScdSpec extends SparkSpec {
  init()
  import spark.implicits._

  test("streamed == batch across chunkings, cross-batch closes and no-ops") {
    // key 1: gold@10 (batch A), no-op gold@400 (batch B), silver@900 (C)
    // key 2: bronze@50 only — stays open through every batch
    val changes = Seq(
      (1L, 10L, 1L, "gold"),
      (1L, 400L, 2L, "gold"),
      (1L, 900L, 3L, "silver"),
      (2L, 50L, 4L, "bronze"))
      .toDF("k", "tus", "id", "tier")
    val batch = Scd.type2History(changes, "k", "tus", "id", Seq("tier"))
      .orderBy("k", "valid_from").collect().toSeq
    for (chunks <- Seq(1, 4)) {
      val streamed = StreamingScd.run(changes, "k", "tus", "id", "tier", chunks)
        .orderBy("k", "valid_from").collect().toSeq
      assert(streamed == batch, s"chunks=$chunks:\n$streamed\nvs\n$batch")
    }
    assert(batch.size == 3)
  }

  test("streamed == batch on real events at 2 and 5 chunks") {
    val ev = core.Tables(spark, sfSmoke, "events")
      .withColumn("tus", unix_micros(col("ts")))
    val batch = Scd.type2History(ev, "user_id", "tus", "event_id", Seq("event_type"))
      .orderBy("user_id", "valid_from").collect().toSeq
    for (chunks <- Seq(2, 5)) {
      val streamed = StreamingScd
        .run(ev, "user_id", "tus", "event_id", "event_type", chunks)
        .orderBy("user_id", "valid_from").collect().toSeq
      assert(streamed == batch, s"chunks=$chunks diverged")
    }
    assert(batch.nonEmpty)
  }
}
