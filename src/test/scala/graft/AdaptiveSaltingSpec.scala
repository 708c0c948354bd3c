package graft

import org.apache.spark.sql.functions._

import graft.operators.Salting

class AdaptiveSaltingSpec extends SparkSpec {
  init()
  import spark.implicits._

  // celebrity key 7L owns half the probe; keys 0-9 in the build dim
  private lazy val probe = ((1L to 4000L).map(i => (if (i % 2 == 0) 7L else i % 10, s"p$i")))
    .toDF("k", "pv")
  private lazy val build = (0L to 9L).map(k => (k, s"b$k")).toDF("k", "bv")

  test("hot-key factors: only measured-hot keys, ceil factors, capped, bounded rows") {
    val f = Salting.hotKeyFactors(probe, "k", threshold = 500, maxSalts = 8)
      .as[(Long, Int)].collect().toMap
    // key 7: 2000 + 400 rows → ceil(2400/500) = 5; all others ≤ 400 → absent
    assert(f == Map(7L -> 5), f.toString)
    val capped = Salting.hotKeyFactors(probe, "k", threshold = 100, maxSalts = 3)
      .as[(Long, Int)].collect().toMap
    assert(capped(7L) == 3 && capped.values.forall(_ <= 3), capped.toString)
  }

  test("adaptive salted join is bag-equal to the plain join; cold keys unreplicated") {
    val f = Salting.hotKeyFactors(probe, "k", threshold = 500, maxSalts = 8)
    val got = Salting.adaptiveSaltedJoin(probe, build, "k", f)
    val want = probe.join(build, "k")
    assert(got.count() == want.count())
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    // empty factors relation degrades to exactly the plain join
    val none = Salting.adaptiveSaltedJoin(probe, build, "k", f.limit(0))
    assert(none.exceptAll(want).isEmpty && want.exceptAll(none).isEmpty)
  }

  test("the hot key's rows actually spread across its salt sub-partitions") {
    val f = Salting.hotKeyFactors(probe, "k", threshold = 500, maxSalts = 8)
    val salted = probe
      .join(broadcast(f), Seq("k"), "left")
      .withColumn(
        "__salt",
        pmod(xxhash64(probe.columns.map(col): _*), coalesce(col("__factor"), lit(1))).cast("int"))
    val spread = salted.filter(col("k") === 7L).select("__salt").distinct().count()
    assert(spread == 5L, s"hot key spread over $spread salts")
    // every sub-partition holds a nontrivial share (hash-uniform spread)
    val per = salted.filter(col("k") === 7L).groupBy("__salt").count()
      .as[(Int, Long)].collect().toMap
    assert(per.values.min > 2400 / 5 / 3, per.toString)
    val cold = salted.filter(col("k") === 1L).select("__salt").distinct().count()
    assert(cold == 1L)
  }

  test("batch-N factors applied to batch N+1: adaptation across micro-batches") {
    // PROMPT-style loop: measure on batch 1, apply to batch 2 (same skew
    // law) — batch 2's join is bag-equal and its hot key spreads without
    // having been scanned for factors itself
    val batch2 = ((1L to 3000L).map(i => (if (i % 2 == 0) 7L else i % 10, s"q$i")))
      .toDF("k", "pv")
    val fromBatch1 = Salting.hotKeyFactors(probe, "k", threshold = 500, maxSalts = 8)
    val got = Salting.adaptiveSaltedJoin(batch2, build, "k", fromBatch1)
    val want = batch2.join(build, "k")
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("engine-level arming: session conf arms the knob, explicit wins, negative forces off") {
    val key = Salting.ThresholdKey
    spark.conf.unset(key)
    // unset conf + default 0 = off
    assert(Salting.armed(spark, key, 0L) == 0L)
    // conf arms every default-knob call site in the session
    spark.conf.set(key, "8")
    try {
      assert(Salting.armed(spark, key, 0L) == 8L)
      // an explicit per-call value always wins over the conf
      assert(Salting.armed(spark, key, 3L) == 3L)
      // explicit negative forces OFF even when the session is armed
      assert(Salting.armed(spark, key, -1L) == 0L)
    } finally spark.conf.unset(key)
    assert(Salting.armed(spark, key, 0L) == 0L)
  }
}
