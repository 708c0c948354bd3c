package graft

import graft.operators.Scd

/** SCD-2 semantics: no-op compression, interval chaining, open current
  * row, multi-attribute tracking, and tiebreak determinism.
  */
class ScdSpec extends SparkSpec {
  init()
  import spark.implicits._

  test("compression + interval chaining on a hand fixture") {
    val changes = Seq(
      (1L, 10L, 1L, "gold"),
      (1L, 20L, 2L, "gold"), // no-op → compressed away
      (1L, 30L, 3L, "silver"),
      (2L, 15L, 4L, "bronze"))
      .toDF("k", "tus", "id", "tier")
    val got = Scd.type2History(changes, "k", "tus", "id", Seq("tier"))
      .orderBy("k", "valid_from")
      .as[(Long, String, Long, Long, Boolean)].collect().toSeq
    assert(got == Seq(
      (1L, "gold", 10L, 30L, false),
      (1L, "silver", 30L, -1L, true),
      (2L, "bronze", 15L, -1L, true)))
  }

  test("same-ts changes order by the tiebreak") {
    val changes = Seq(
      (1L, 10L, 1L, "a"),
      (1L, 10L, 2L, "b")) // same µs: id 2 wins as the later change
      .toDF("k", "tus", "id", "v")
    val got = Scd.type2History(changes, "k", "tus", "id", Seq("v"))
      .orderBy("v")
      .as[(Long, String, Long, Long, Boolean)].collect().toSeq
    assert(got == Seq((1L, "a", 10L, 10L, false), (1L, "b", 10L, -1L, true)))
  }

  test("NULL attributes are values: NULL→NULL compresses, NULL↔x opens") {
    val changes = Seq(
      (1L, 10L, 1L, Option.empty[String]),
      (1L, 20L, 2L, Option.empty[String]), // NULL → NULL: compressed
      (1L, 30L, 3L, Some("gold")), // NULL → gold: opens
      (1L, 40L, 4L, Option.empty[String])) // gold → NULL: opens
      .toDF("k", "tus", "id", "tier")
    val got = Scd.type2History(changes, "k", "tus", "id", Seq("tier"))
      .orderBy("valid_from")
      .as[(Long, Option[String], Long, Long, Boolean)].collect().toSeq
    assert(got == Seq(
      (1L, None, 10L, 30L, false),
      (1L, Some("gold"), 30L, 40L, false),
      (1L, None, 40L, -1L, true)))
  }

  test("multi-attribute: any tracked column changing opens an interval") {
    val changes = Seq(
      (1L, 10L, 1L, "gold", "us"),
      (1L, 20L, 2L, "gold", "eu"), // region change alone still counts
      (1L, 30L, 3L, "gold", "eu")) // full no-op → compressed
      .toDF("k", "tus", "id", "tier", "region")
    val got = Scd.type2History(changes, "k", "tus", "id", Seq("tier", "region"))
      .orderBy("valid_from")
      .as[(Long, String, String, Long, Long, Boolean)].collect().toSeq
    assert(got == Seq(
      (1L, "gold", "us", 10L, 20L, false),
      (1L, "gold", "eu", 20L, -1L, true)))
  }

  test("bitemporal: a late correction is invisible before its tx time, splices after") {
    // key 1: state A valid from 10 (committed at 11), state B valid from 30
    // (committed at 31), and a LATE CORRECTION: state C valid from 20 but
    // only committed at 50.
    val log = Seq(
      (1L, 10L, 11L, 1L, "A"),
      (1L, 30L, 31L, 2L, "B"),
      (1L, 20L, 50L, 3L, "C"))
      .toDF("k", "tus", "txus", "id", "state")
    def snap(t: Long) =
      Scd.asKnownAt(log, "k", "tus", "txus", "id", Seq("state"), t)
        .orderBy("valid_from")
        .as[(Long, String, Long, Long, Boolean)].collect().toSeq
    // as known at 40: the correction has not committed — A then B
    assert(snap(40L) == Seq(
      (1L, "A", 10L, 30L, false),
      (1L, "B", 30L, -1L, true)))
    // as known at 60: C splices between A and B by VALID time
    assert(snap(60L) == Seq(
      (1L, "A", 10L, 20L, false),
      (1L, "C", 20L, 30L, false),
      (1L, "B", 30L, -1L, true)))
    // before anything committed: empty history
    assert(snap(5L).isEmpty)
  }
}
