package graft

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.operators.AsOfJoin

class AsOfJoinSpec extends SparkSpec {
  init()

  test("as-of join equals the brute-force max-preceding lookup on sf0.001 events") {
    val ev = Tables(spark, sfSmoke, "events")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"), col("ts"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("user_id"), col("ts"),
        col("value").as("view_value"))

    val got = AsOfJoin.backward(clicks, views, Seq("user_id"), "ts", "view_id")
      .select(
        col("click_id"),
        coalesce(col("view_id"), lit(-1L)).as("view_id"),
        coalesce(col("view_value"), lit(-1.0)).as("view_value"))

    // brute force: all preceding views per click, keep max (ts, view_id)
    val v = views.select(
      col("user_id").as("v_user"), col("view_id").as("v_id"),
      col("ts").as("v_ts"), col("view_value").as("v_val"))
    val best = clicks
      .join(v, col("user_id") === col("v_user") && col("v_ts") <= col("ts"), "left")
      .withColumn(
        "rk",
        row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy("click_id")
            .orderBy(col("v_ts").desc_nulls_last, col("v_id").desc_nulls_last)))
      .filter(col("rk") === 1)
      .select(
        col("click_id"),
        coalesce(col("v_id"), lit(-1L)).as("view_id"),
        coalesce(col("v_val"), lit(-1.0)).as("view_value"))

    assert(got.count() == clicks.count())
    assert(got.exceptAll(best).isEmpty && best.exceptAll(got).isEmpty)
  }

  test("forward as-of equals the brute-force min-following lookup on sf0.001 events") {
    val ev = Tables(spark, sfSmoke, "events")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"), col("ts"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("user_id"), col("ts"),
        col("value").as("view_value"))

    val got = AsOfJoin.forward(clicks, views, Seq("user_id"), "ts", "view_id")
      .select(
        col("click_id"),
        coalesce(col("view_id"), lit(-1L)).as("view_id"))

    val v = views.select(
      col("user_id").as("v_user"), col("view_id").as("v_id"), col("ts").as("v_ts"))
    val best = clicks
      .join(v, col("user_id") === col("v_user") && col("v_ts") >= col("ts"), "left")
      .withColumn(
        "rk",
        row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy("click_id")
            .orderBy(col("v_ts").asc_nulls_last, col("v_id").desc_nulls_last)))
      .filter(col("rk") === 1)
      .select(col("click_id"), coalesce(col("v_id"), lit(-1L)).as("view_id"))

    assert(got.count() == clicks.count())
    assert(got.exceptAll(best).isEmpty && best.exceptAll(got).isEmpty)
  }

  test("equal timestamps match (<=) and ties resolve to the greatest tiebreak") {
    import spark.implicits._
    val left = Seq((1L, 100L, "a"), (1L, 50L, "b")).toDF("k", "t", "tag")
    val right = Seq(
      (1L, 100L, 7L, 1.0), // same instant as left "a" — must match
      (1L, 100L, 9L, 2.0), // equal (k, t): greater id wins
      (1L, 60L, 5L, 3.0))
      .toDF("k", "t", "rid", "rv")
    val got = AsOfJoin.backward(left, right, Seq("k"), "t", "rid")
      .select(col("tag"), col("rid"), col("rv"))
      .as[(String, Option[Long], Option[Double])].collect().toSet
    assert(got == Set(("a", Some(9L), Some(2.0)), ("b", None, None)))
  }

  test("epoch-bucketed form equals the plain window form on sf0.001 events (both directions)") {
    val ev = Tables(spark, sfSmoke, "events")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"), col("ts"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("user_id"), col("ts"),
        col("value").as("view_value"))
    // 1-hour buckets in µs — events span many buckets, so carries are real
    val w = 3600L * 1000 * 1000
    for (fwd <- Seq(false, true)) {
      val plain =
        if (fwd) AsOfJoin.forward(clicks, views, Seq("user_id"), "ts", "view_id")
        else AsOfJoin.backward(clicks, views, Seq("user_id"), "ts", "view_id")
      val bucketed =
        if (fwd) AsOfJoin.forwardBucketed(clicks, views, Seq("user_id"), "ts", "view_id", w)
        else AsOfJoin.backwardBucketed(clicks, views, Seq("user_id"), "ts", "view_id", w)
      val p = plain.select(col("click_id"), coalesce(col("view_id"), lit(-1L)).as("vid"))
      val b = bucketed.select(col("click_id"), coalesce(col("view_id"), lit(-1L)).as("vid"))
      assert(b.count() == p.count(), s"fwd=$fwd")
      assert(b.exceptAll(p).isEmpty && p.exceptAll(b).isEmpty, s"fwd=$fwd")
    }
  }

  test("epoch-bucketed form handles one key holding ~all rows (the skew case)") {
    import spark.implicits._
    // one giant key: 20k rights + 5k lefts on key 1, a few rows on key 2
    val rights = (1L to 20000L).map(i => (1L, i * 10L, i, i * 0.5)) ++
      Seq((2L, 100L, 90001L, 1.0))
    val lefts = (1L to 5000L).map(i => (1L, i * 40L + 5L, s"c$i")) ++
      Seq((2L, 50L, "c-none"), (2L, 150L, "c-match"))
    val l = lefts.toDF("k", "t", "tag")
    val r = rights.toDF("k", "t", "rid", "rv")
    val plain = AsOfJoin.backward(l, r, Seq("k"), "t", "rid")
      .select(col("tag"), coalesce(col("rid"), lit(-1L)).as("rid"))
    // small buckets → thousands of buckets for the giant key
    val bucketed = AsOfJoin.backwardBucketed(l, r, Seq("k"), "t", "rid", bucketWidth = 1000L)
      .select(col("tag"), coalesce(col("rid"), lit(-1L)).as("rid"))
    assert(bucketed.count() == plain.count())
    assert(bucketed.exceptAll(plain).isEmpty && plain.exceptAll(bucketed).isEmpty)
    // spot-check the carry: a left row in a bucket with no right rows
    // still matches the previous bucket's last right row
    val got = bucketed.as[(String, Long)].collect().toMap
    assert(got("c-none") == -1L)
    assert(got("c-match") == 90001L)
  }

  test("null-time rows: right side is unmatchable, left side gets a null match") {
    import spark.implicits._
    val left = Seq((1L, Some(50L), "early"), (1L, Some(200L), "late"), (1L, None, "nul"))
      .toDF("k", "t", "tag")
    val right = Seq(
      (1L, None, 99L, 9.9), // null-time right row: must never be carried
      (1L, Some(100L), 5L, 1.0))
      .toDF("k", "t", "rid", "rv")
    val back = AsOfJoin.backward(left, right, Seq("k"), "t", "rid")
      .select(col("tag"), col("rid"))
      .as[(String, Option[Long])].collect().toSet
    // "early" precedes every real right row; "nul" compares unknown → no match
    assert(back == Set(("early", None), ("late", Some(5L)), ("nul", None)))
    val fwd = AsOfJoin.forward(left, right, Seq("k"), "t", "rid")
      .select(col("tag"), col("rid"))
      .as[(String, Option[Long])].collect().toSet
    assert(fwd == Set(("early", Some(5L)), ("late", None), ("nul", None)))
  }
}
