package graft

import org.apache.spark.sql.functions._

import graft.streaming.StreamingIvmJoin

class StreamingIvmJoinSpec extends SparkSpec {
  init()

  import spark.implicits._

  // jk=1 throughout; seq 0..22 over 3 chunks (per = 8): batches {0,1},
  // {10,11}, {20,21,22}
  private lazy val changes = Seq(
    // batch 0: first row each side
    (1L, "a", 1L, 0L, 1L, "upsert", 10L),
    (1L, "b", 100L, 1L, 2L, "upsert", 5L),
    // batch 1: a value-update + a new b row
    (1L, "a", 1L, 10L, 3L, "upsert", 11L),
    (1L, "b", 101L, 11L, 4L, "upsert", 7L),
    // batch 2: b delete + identical a rewrite (must emit NOTHING) + new a
    (1L, "b", 100L, 20L, 5L, "delete", 0L),
    (1L, "a", 1L, 21L, 6L, "upsert", 11L),
    (1L, "a", 2L, 22L, 7L, "upsert", 3L)
  ).toDF("jk", "side", "pk", "seq", "tiebreak", "op", "v")

  test("per-batch deltas follow the Gupta-Mumick join identity, netted") {
    val got = StreamingIvmJoin
      .run(changes, "jk", "side", "pk", "seq", "tiebreak", "op", "v", chunks = 3)
      .as[(Int, Long, Long, Long, Long, Long, Long)].collect().toSet
    val want = Set(
      (0, 1L, 1L, 100L, 10L, 5L, 1L),
      (1, 1L, 1L, 100L, 10L, 5L, -1L),
      (1, 1L, 1L, 100L, 11L, 5L, 1L),
      (1, 1L, 1L, 101L, 11L, 7L, 1L),
      // batch 2: the (2,100) cross terms from the a-insert x B_old and the
      // b-delete x A_new CANCEL in the netting; the identical a rewrite
      // emits nothing
      (2, 1L, 1L, 100L, 11L, 5L, -1L),
      (2, 1L, 2L, 101L, 3L, 7L, 1L))
    assert(got == want, s"got $got")
  }

  test("folded deltas equal the batch join of the final snapshots") {
    val deltas = StreamingIvmJoin
      .run(changes, "jk", "side", "pk", "seq", "tiebreak", "op", "v", chunks = 3)
    val view = StreamingIvmJoin.viewFromDeltas(deltas)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(view == Set((1L, 1L, 101L, 11L, 7L), (1L, 2L, 101L, 3L, 7L)))

    // and on a churny derived fixture: fold == batch join, whatever the
    // chunking (1 batch vs 4 batches must agree)
    val ev = graft.core.Tables(spark, sfSmoke, "events")
    val ch = ev.select(
      pmod(col("user_id"), lit(10)).as("jk"),
      when(pmod(col("event_id"), lit(2)) === 0, lit("a")).otherwise(lit("b")).as("side"),
      col("user_id").as("pk"),
      unix_micros(col("ts")).as("seq"),
      col("event_id").as("tiebreak"),
      when(col("event_type") === "error", lit("delete"))
        .otherwise(lit("upsert")).as("op"),
      expr("CAST(round(value * 100) AS BIGINT)").as("v"))
    val v4 = StreamingIvmJoin.viewFromDeltas(
      StreamingIvmJoin.run(ch, "jk", "side", "pk", "seq", "tiebreak", "op", "v", 4))
    val v1 = StreamingIvmJoin.viewFromDeltas(
      StreamingIvmJoin.run(ch, "jk", "side", "pk", "seq", "tiebreak", "op", "v", 1))
    assert(v4.exceptAll(v1).isEmpty && v1.exceptAll(v4).isEmpty)
  }
}
