package graft

import org.apache.spark.sql.functions._

import graft.operators.Decay

class DecaySpec extends SparkSpec {
  init()

  import spark.implicits._

  // generations of 10s, horizon 3, asOf = 100 (gen 10):
  //   k=a: events at 95 (gen 9, age 1, w 4), 85 ×2 (gen 8, age 2, w 2)
  //   k=b: events at 100 (gen 10, age 0, w 8), 60 (age 4 > horizon, w 0)
  //   k=c: event at 110 (future gen, age < 0, w 0) only → absent
  //   k=d: event at 70 (gen 7, age 3, w 1)
  //   k=e: event at 105 — INSIDE the as-of generation but AFTER asOfSec:
  //        the event-exact cutoff excludes it (ADVICE r10) → absent
  private lazy val fixture = Seq(
    ("a", 95L), ("a", 85L), ("a", 85L),
    ("b", 100L), ("b", 60L),
    ("c", 110L),
    ("d", 70L),
    ("e", 105L)).toDF("k", "tsec")

  test("decayedCounts: hand-computed weights, horizon cutoff, future exclusion") {
    val got = Decay.decayedCounts(fixture, Seq("k"), "tsec", asOfSec = 100L,
        genSecs = 10L, horizon = 3)
      .as[(String, Long, Long)].collect().map { case (k, n, d) => k -> ((n, d)) }.toMap
    assert(got == Map(
      "a" -> ((3L, 8L)), // 4 + 2 + 2
      "b" -> ((1L, 8L)), // the age-4 event is outside the horizon
      "d" -> ((1L, 1L)))) // age 3 → weight 2^0; "c"/"e" absent (future-only)
  }

  test("half-life dominance: a key must double per generation older to tie") {
    // x: 4 events at age 2 (4·2 = 8) ties y: 1 event at age 0 (8);
    // z: 3 events at age 2 (6) loses to both
    val df = Seq(
      ("x", 80L), ("x", 80L), ("x", 81L), ("x", 82L),
      ("y", 100L),
      ("z", 80L), ("z", 81L), ("z", 82L)).toDF("k", "tsec")
    val scores = Decay.decayedCounts(df, Seq("k"), "tsec", 100L, 10L, 3)
      .as[(String, Long, Long)].collect().map(r => r._1 -> r._3).toMap
    assert(scores("x") == scores("y") && scores("z") < scores("y"))
  }

  test("decayedTopK equals a driver-side reorder of the full score relation") {
    val ev = graft.core.Tables(spark, sfSmoke, "events")
      .select(col("user_id"), expr("unix_micros(ts) div 1000000").as("tsec"))
    val asOf = ev.agg(max("tsec")).head().getLong(0)
    val full = Decay.decayedCounts(ev, Seq("user_id"), "tsec", asOf, 86400L, 14)
      .as[(Long, Long, Long)].collect()
      .sortBy { case (u, _, d) => (-d, u) }
      .take(5)
    val got = Decay.decayedTopK(ev, Seq("user_id"), "tsec", asOf, 86400L, 14, 5)
      .orderBy("rank")
      .select("user_id", "n_window", "decayed")
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == full.toSeq)
  }

  test("partition invariance: scores identical under repartition") {
    val ev = graft.core.Tables(spark, sfSmoke, "events")
      .select(col("user_id"), expr("unix_micros(ts) div 1000000").as("tsec"))
    val asOf = ev.agg(max("tsec")).head().getLong(0)
    val a = Decay.decayedCounts(ev, Seq("user_id"), "tsec", asOf, 86400L, 14)
      .orderBy("user_id").collect().toSeq
    val b = Decay.decayedCounts(ev.repartition(13), Seq("user_id"), "tsec", asOf, 86400L, 14)
      .orderBy("user_id").collect().toSeq
    assert(a == b)
  }
}
