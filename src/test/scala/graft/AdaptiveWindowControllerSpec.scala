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
