package graft

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.operators.RangeJoin

class RangeJoinSpec extends SparkSpec {
  init()

  private val Hour = 3600L * 1000 * 1000 // micros

  test("bucketed range join equals the inequality join on sf0.001 events") {
    val ev = Tables(spark, sfSmoke, "events")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"), unix_micros(col("ts")).as("ts"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("user_id"), unix_micros(col("ts")).as("vts"))

    val got = RangeJoin
      .timeRange(clicks, views, Seq("user_id"), "ts", "vts", -Hour, 0L)
      .select("click_id", "view_id")

    val brute = clicks.join(
        views.withColumnRenamed("user_id", "v_user"),
        col("user_id") === col("v_user") &&
          col("vts").between(col("ts") - Hour, col("ts")))
      .select("click_id", "view_id")

    assert(got.count() == brute.count())
    assert(got.exceptAll(brute).isEmpty && brute.exceptAll(got).isEmpty)
  }

  test("window boundaries are inclusive and bucket edges are exact") {
    import spark.implicits._
    val w = 10L
    val left = Seq((1L, 100L)).toDF("k", "t")
    val right = Seq(
      (1L, 90L, "at-lower"), // t − 10: included
      (1L, 100L, "at-upper"), // t: included
      (1L, 89L, "below"), // outside
      (1L, 101L, "above"), // outside
      (2L, 95L, "wrong-key"))
      .toDF("k", "rt", "tag")
    val got = RangeJoin.timeRange(left, right, Seq("k"), "t", "rt", -w, 0L)
      .select("tag").as[String].collect().toSet
    assert(got == Set("at-lower", "at-upper"))
  }

  test("negative times bucket exactly (floor division, not truncation)") {
    import spark.implicits._
    val left = Seq((1L, -100L)).toDF("k", "t")
    val right = Seq(
      (1L, -110L, "at-lower"), // t − 10: included
      (1L, -100L, "at-upper"), // t: included
      (1L, -111L, "below"),
      (1L, -99L, "above"))
      .toDF("k", "rt", "tag")
    val got = RangeJoin.timeRange(left, right, Seq("k"), "t", "rt", -10L, 0L)
      .select("tag").as[String].collect().toSet
    assert(got == Set("at-lower", "at-upper"))
  }

  test("range join plans a hash equi-join, not a cartesian or pure range join") {
    val ev = Tables(spark, sfSmoke, "events")
    val l = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("lid"), col("user_id"), unix_micros(col("ts")).as("ts"))
    val r = ev.filter(col("event_type") === "view")
      .select(col("event_id").as("rid"), col("user_id"), unix_micros(col("ts")).as("rts"))
    val plan = RangeJoin.timeRange(l, r, Seq("user_id"), "ts", "rts", -Hour, 0L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }
}
