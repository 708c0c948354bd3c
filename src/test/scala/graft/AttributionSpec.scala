package graft

import org.apache.spark.sql.functions._

import graft.operators.Attribution

class AttributionSpec extends SparkSpec {
  init()

  import spark.implicits._

  // user 1: v(10) c(20) v(30) P(40) | v(50) P(60)   -> convs with 3 and 1 touches
  // user 2: v(10) P(15) with window too small for v(1)
  // user 3: touches but NO conversion -> nothing attributed
  // user 4: conversion with NO touches -> no rows (conversion itself is not a touch)
  private lazy val ev = Seq(
    (1L, 10L, 101L, "view"), (1L, 20L, 102L, "click"), (1L, 30L, 103L, "view"),
    (1L, 40L, 104L, "purchase"), (1L, 50L, 105L, "view"), (1L, 60L, 106L, "purchase"),
    (2L, 1L, 201L, "view"), (2L, 10L, 202L, "view"), (2L, 15L, 203L, "purchase"),
    (3L, 5L, 301L, "click"),
    (4L, 5L, 401L, "purchase"),
    (1L, 70L, 107L, "error") // irrelevant type never attributes
  ).toDF("user_id", "tus", "event_id", "event_type")

  private def run(model: String, windowUs: Long = 100L) =
    Attribution.multiTouch(
      ev, "user_id", "tus", "event_id", "event_type",
      Seq("view", "click"), "purchase", windowUs, model)

  test("linear: credits sum to 10000 with remainder to earliest touches") {
    val got = run("linear")
      .select("user_id", "conv_id", "event_id", "credit_bp")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == Set(
      (1L, 104L, 101L, 3334L), (1L, 104L, 102L, 3333L), (1L, 104L, 103L, 3333L),
      (1L, 106L, 105L, 10000L),
      (2L, 203L, 201L, 5000L), (2L, 203L, 202L, 5000L)))
    // window cut: with windowUs = 8 user 2's v(1) is out of range of P(15)
    val cut = run("linear", windowUs = 8L)
      .filter(col("user_id") === 2L)
      .select("event_id", "credit_bp").as[(Long, Long)].collect().toSet
    assert(cut == Set((202L, 10000L)))
  }

  test("u-shaped: 40/40/20 with exact middles; sums are 10000 for every k") {
    val bigger = (1 to 7).map(i => (9L, i * 10L, 900L + i, "view")) :+
      ((9L, 100L, 999L, "purchase"))
    val df = ev.unionByName(bigger.toDF("user_id", "tus", "event_id", "event_type"))
    val got = Attribution.multiTouch(
        df, "user_id", "tus", "event_id", "event_type",
        Seq("view", "click"), "purchase", 1000L, "u")
      .groupBy("user_id", "conv_id")
      .agg(sum("credit_bp").as("s"), count(lit(1)).as("k"))
      .as[(Long, Long, Long, Long)].collect()
    assert(got.forall(_._3 == 10000L), s"every conversion must sum to 10000: ${got.toSeq}")
    // k=7: first/last 4000, middles get 2000 div 5 = 400
    val mid = Attribution.multiTouch(
        df, "user_id", "tus", "event_id", "event_type",
        Seq("view", "click"), "purchase", 1000L, "u")
      .filter(col("user_id") === 9L)
      .select("touch_rank", "credit_bp").as[(Long, Long)].collect().toMap
    assert(mid(1L) == 4000L && mid(7L) == 4000L && mid(4L) == 400L)
  }

  test("touches without a conversion (or outside the window) attribute nothing") {
    val got = run("linear")
    assert(got.filter(col("user_id") === 3L).isEmpty)
    assert(got.filter(col("user_id") === 4L).isEmpty)
    assert(got.filter(col("event_id") === 107L).isEmpty)
  }

  test("multi_touch TVF matches the operator") {
    ev.createOrReplaceTempView("attr_ev")
    val sqlDf = spark.sql(
      "SELECT * FROM multi_touch('attr_ev', 'user_id', 'tus', 'event_id', " +
        "'event_type', 'view,click', 'purchase', 100, 'u')")
    val scalaDf = run("u")
    assert(sqlDf.columns.toSeq == scalaDf.columns.toSeq)
    assert(sqlDf.exceptAll(scalaDf).isEmpty && scalaDf.exceptAll(sqlDf).isEmpty)
  }

  test("maxEventsPerKey guard: no-op under the bound, fails with the contract's name over it") {
    val guardedOk = Attribution.multiTouch(
      ev, "user_id", "tus", "event_id", "event_type",
      Seq("view", "click"), "purchase", 100L, "linear", maxEventsPerKey = 10L)
    val base = run("linear")
    assert(guardedOk.exceptAll(base).isEmpty && base.exceptAll(guardedOk).isEmpty)

    // user 1 has 6 relevant events; a bound of 3 must fail BY NAME
    val ex = intercept[Exception] {
      Attribution.multiTouch(
        ev, "user_id", "tus", "event_id", "event_type",
        Seq("view", "click"), "purchase", 100L, "linear", maxEventsPerKey = 3L).collect()
    }
    val msgs = Iterator.iterate(ex: Throwable)(_.getCause).takeWhile(_ != null)
      .map(_.getMessage).filter(_ != null).mkString(" | ")
    assert(msgs.contains("Attribution.multiTouch") && msgs.contains("maxEventsPerKey=3"), msgs)
  }
}
