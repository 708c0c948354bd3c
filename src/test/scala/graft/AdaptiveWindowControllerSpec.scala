package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.AdaptiveWindowController
import graft.streaming.AdaptiveWindowController.{Config, Timings}

/** Controller policy tests with synthetic timings — no Spark session.
  * Expected behavior per the reference hill-climb
  * (`DS-Join/DS_join_step4/src/main/scala/streaming.scala:462-540`).
  */
class AdaptiveWindowControllerSpec extends AnyFunSuite {

  private val cfg = Config(initialWindow = 4, warmupBatches = 3, cap = 140, capTo = 130)

  private def step(
      s: AdaptiveWindowController.State,
      id: Long,
      cog: Double,
      fetch: Double,
      cache: Double,
      missedEmpty: Boolean = false) = {
    val adv = AdaptiveWindowController.advance(s, cfg, id, Timings(cog, fetch, 0), missedEmpty)
    AdaptiveWindowController.recordCacheTime(adv, cache)
  }

  test("warm-up batches grow the window unconditionally") {
    var s = AdaptiveWindowController.initial(cfg)
    s = step(s, 1, 100, 100, 10)
    s = step(s, 2, 100, 100, 10)
    s = step(s, 3, 100, 100, 10)
    assert(s.window == 7) // 4 + 3 grows
    assert(s.saved == 7)
  }

  test("no misses grows the window regardless of timings") {
    var s = AdaptiveWindowController.initial(cfg).copy(window = 10, saved = 10)
    s = step(s, 10, 50, 0, 5, missedEmpty = true)
    assert(s.window == 11 && s.saved == 11)
  }

  test("fetch-dominated improvement grows the window") {
    var s = AdaptiveWindowController.initial(cfg)
    // history: prev total = 100+200, prev2 cache = 50 → ppAll = 350
    s = s.copy(window = 10, saved = 10, prev = Timings(100, 200, 20), prev2 = Timings(0, 0, 50))
    // curr: cog=50, fetch=150, prevCache=20 → pAll = 220 < 350 (improved);
    // fetch(150) > cog(50)+prevCache(20) → DB-dominated → grow
    s = step(s, 10, 50, 150, 10)
    assert(s.window == 11)
    assert(s.saved == 10) // saved before the grow step
  }

  test("cache-dominated improvement shrinks the window") {
    var s = AdaptiveWindowController.initial(cfg)
    s = s.copy(window = 10, saved = 10, prev = Timings(100, 200, 80), prev2 = Timings(0, 0, 50))
    // pAll = 50+20+80 = 150 < ppAll = 350; fetch(20) < cog(50)+prevCache(80) → shrink
    s = step(s, 10, 50, 20, 10)
    assert(s.window == 9)
  }

  test("window never shrinks below 1") {
    var s = AdaptiveWindowController.initial(cfg)
    s = s.copy(window = 1, saved = 1, prev = Timings(100, 200, 80), prev2 = Timings(0, 0, 50))
    s = step(s, 10, 50, 20, 10)
    assert(s.window == 1)
  }

  test("regression reverts to the saved best window") {
    var s = AdaptiveWindowController.initial(cfg)
    s = s.copy(window = 20, saved = 12, prev = Timings(10, 10, 10), prev2 = Timings(100, 100, 100))
    // pAll = 50+150+10 = 210 > ppAll = 10+10+100 = 120 → revert to saved
    s = step(s, 10, 50, 150, 10)
    assert(s.window == 12)
  }

  test("cap clamps runaway growth") {
    var s = AdaptiveWindowController.initial(cfg).copy(window = 140, saved = 140)
    s = step(s, 10, 50, 0, 5, missedEmpty = true) // would grow to 141
    assert(s.window == 130 && s.saved == 129)
  }

  test("all-hit workload grows until the cap, then oscillates inside it") {
    var s = AdaptiveWindowController.initial(cfg)
    (1L to 300L).foreach { i => s = step(s, i, 50, 0, 5, missedEmpty = true) }
    assert(s.window <= 140)
    assert(s.window >= 1)
  }

  // ---- DSim-final's query-count rule (`DS_SimJoin_stream.scala:649-666`) ----
  private val qc = AdaptiveWindowController.QueryCountConfig(warmupBatches = 3)
  private def qcStep(s: AdaptiveWindowController.State, id: Long, count: Long) =
    AdaptiveWindowController.advanceByQueryCount(s, qc, id, count)

  test("query-count rule: pre-warmup batches grow the window unconditionally") {
    var s = AdaptiveWindowController.initial(cfg)
    s = qcStep(s, 1, 1000); s = qcStep(s, 2, 1000); s = qcStep(s, 3, 1000)
    assert(s.window == 7 && s.saved == 7)
  }

  test("query-count rule: light batches take the long window") {
    val s = qcStep(AdaptiveWindowController.initial(cfg).copy(window = 10), 10, 29)
    assert(s.window == 50)
  }

  test("query-count rule: medium batches take the mid window") {
    val s = qcStep(AdaptiveWindowController.initial(cfg).copy(window = 10), 10, 100)
    assert(s.window == 40)
  }

  test("query-count rule: heavy batches take the short window") {
    val s = qcStep(AdaptiveWindowController.initial(cfg).copy(window = 10), 10, 151)
    assert(s.window == 30)
  }

  test("query-count rule: boundary counts leave the window unchanged (strict inequalities)") {
    // 30, 50 and 150 satisfy none of the reference's strict comparisons
    for (boundary <- Seq(30L, 50L, 150L)) {
      val s = qcStep(AdaptiveWindowController.initial(cfg).copy(window = 10, saved = 10),
        10, boundary)
      assert(s.window == 10, s"count=$boundary")
    }
  }

  // ---- myNapp_v1 cache-size heuristic (CacheSizeRule) ----

  private val szCfg = AdaptiveWindowController.SizeHeuristicConfig(warmupBatches = 10)
  private def szStep(
      st: AdaptiveWindowController.SizeHeuristicState,
      id: Long,
      cog: Double, fetch: Double,
      reg1: (Double, Double, Double) = (0, 0, 0),
      reg2: (Double, Double, Double) = (0, 0, 0),
      count: Long = 1000L) =
    AdaptiveWindowController.advanceBySizeHeuristic(
      st, szCfg, id,
      AdaptiveWindowController.Timings(cog, fetch, 0),
      AdaptiveWindowController.Timings(reg1._1, reg1._2, reg1._3),
      AdaptiveWindowController.Timings(reg2._1, reg2._2, reg2._3),
      count)

  test("size rule: no cleaning during warmup even under rising cache cost") {
    val s0 = AdaptiveWindowController.SizeHeuristicState()
    val s = szStep(s0, id = 5, cog = 500, fetch = 10, reg1 = (100, 10, 50), reg2 = (100, 10, 10))
    assert(s.frontier == 0 && !s.continuous)
  }

  test("size rule: cache-cost rise above fetch movement advances the frontier") {
    val s0 = AdaptiveWindowController.SizeHeuristicState(countNew = 2000, properCount = 1000)
    // cacheDiff = (500-100) + (50-10) = 440 > |10-10| = 0 → clean;
    // countNew(2000) > proper(1000) → step widens to 2
    val s = szStep(s0, id = 20, cog = 500, fetch = 10, reg1 = (100, 10, 50), reg2 = (100, 10, 10))
    assert(s.continuous && s.numDel == 2 && s.frontier == 2)
  }

  test("size rule: a fall smaller than the previous rise still cleans") {
    val s0 = AdaptiveWindowController.SizeHeuristicState(
      prevDiff = 100.0, countNew = 500, properCount = 1000)
    // cacheDiff = -40 (fell), but prevDiff 100 > 40 → clean; cache below
    // target → step narrows toward 1 (already 1 → stays)
    val s = szStep(s0, id = 20, cog = 60, fetch = 10, reg1 = (100, 10, 10), reg2 = (100, 10, 10))
    assert(s.continuous && s.numDel == 1 && s.frontier == 1)
  }

  test("size rule: target halves toward the observed size on a non-consecutive clean") {
    val s0 = AdaptiveWindowController.SizeHeuristicState(
      properCount = 4000, countOld = 1000, countNew = 5000, continuous = false)
    val s = szStep(s0, id = 20, cog = 500, fetch = 10, reg1 = (100, 10, 50), reg2 = (100, 10, 10))
    assert(s.properCount == (4000 + 1000) / 2)
    // and a CONSECUTIVE clean leaves the target alone
    val s2 = szStep(s.copy(countNew = 5000), id = 21, cog = 900, fetch = 10,
      reg1 = (500, 10, 90), reg2 = (100, 10, 50))
    assert(s2.continuous && s2.properCount == s.properCount)
  }

  test("size rule: the step resets to 1 rather than evicting every remaining epoch") {
    val s0 = AdaptiveWindowController.SizeHeuristicState(
      frontier = 15, numDel = 6, countNew = 5000, properCount = 1000)
    // remaining epochs = 20 - 15 = 5 ≤ widened step 7 → reset to 1
    val s = szStep(s0, id = 20, cog = 500, fetch = 10, reg1 = (100, 10, 50), reg2 = (100, 10, 10))
    assert(s.numDel == 1 && s.frontier == 16)
  }

  test("size rule: target seeds from the first observed cache count") {
    val s0 = AdaptiveWindowController.SizeHeuristicState()
    val s = szStep(s0, id = 1, cog = 10, fetch = 10, count = 777L)
    assert(s.properCount == 777L && s.countNew == 777L)
  }

  test("steady improvement converges: window stays within [1, cap] over a noisy run") {
    var s = AdaptiveWindowController.initial(cfg)
    val rnd = new scala.util.Random(42)
    (1L to 500L).foreach { i =>
      val fetch = 100 + rnd.nextInt(100)
      val cog = 50 + rnd.nextInt(50)
      val cache = 20 + rnd.nextInt(30)
      s = step(s, i, cog.toDouble, fetch.toDouble, cache.toDouble)
      assert(s.window >= 1 && s.window <= 140, s"batch $i window ${s.window}")
    }
  }
}
