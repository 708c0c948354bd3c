package graft.streaming

/** Adaptive caching-window controller — the papers' core contribution,
  * re-expressed as a pure function over batch timings.
  *
  * The caching window `w` is the number of recent micro-batches a stored-side
  * row must have been touched in to stay cached; eviction drops rows whose
  * last touch is older than `batchId − w`. The controller hill-climbs `w`
  * each batch on the total stage time, mirroring the reference's feedback
  * loop (`DS-Join/DS_join_step4/src/main/scala/streaming.scala:462-540`):
  *
  *   - no misses this batch → grow (cache is winning; reference `:486-489`);
  *   - still warming up → grow and save (reference `:521-524`);
  *   - total time rose vs the previous batch → revert to the saved best
  *     window (reference `:495-498`);
  *   - total time fell → save this window as best, then steer by the
  *     dominant cost: fetch-dominated → grow (cache more), cache-maintenance-
  *     dominated → shrink (reference `:500-515`);
  *   - hard cap: `w > cap` resets to `capTo` (reference `:517-520`).
  *
  * Cache-update cost enters the comparison one batch late (`pCache` joins
  * the current cog+fetch sum) because the reference applies a batch's cache
  * mutation concurrently with the next batch — the lag is part of the
  * algorithm, not an accident.
  *
  * All state is in the immutable [[AdaptiveWindowController.State]], so the
  * policy unit-tests with synthetic timings and the streaming runtime just
  * folds batches through [[AdaptiveWindowController.advance]].
  */
object AdaptiveWindowController {

  /** Per-batch stage costs, milliseconds. `cog` = hit/miss split, `fetch` =
    * stored-side fetch of missed keys, `cache` = state (cache+LRU) update.
    */
  final case class Timings(cogMs: Double, fetchMs: Double, cacheMs: Double)

  object Timings { val zero: Timings = Timings(0, 0, 0) }

  final case class Config(
      initialWindow: Int = 4,
      warmupBatches: Int = 3,
      cap: Int = 140,
      capTo: Int = 130)

  /** `window` = current caching window; `saved` = best-known window the
    * controller reverts to on regression; `prev`/`prev2` = the timing
    * registers of the last two completed batches (the reference's p/pp
    * shift registers, `streaming.scala:636-659`).
    */
  final case class State(
      window: Int,
      saved: Int,
      prev: Timings,
      prev2: Timings)

  def initial(config: Config): State =
    State(config.initialWindow, config.initialWindow, Timings.zero, Timings.zero)

  /** One controller step. `curr` carries this batch's cog+fetch cost (its
    * cache cost is not yet known — pass it via the register shift below),
    * `missedEmpty` = the batch had no cache misses.
    */
  def advance(
      state: State,
      config: Config,
      batchId: Long,
      curr: Timings,
      missedEmpty: Boolean): State = {
    val pAll = curr.cogMs + curr.fetchMs + state.prev.cacheMs
    val ppAll = state.prev.cogMs + state.prev.fetchMs + state.prev2.cacheMs

    var window = state.window
    var saved = state.saved

    if (missedEmpty) {
      window += 1
      saved = window
    } else if (batchId > config.warmupBatches) {
      if (pAll > ppAll) {
        window = saved
      } else if (pAll < ppAll) {
        saved = window
        if (curr.fetchMs > curr.cogMs + state.prev.cacheMs) window += 1
        else if (curr.fetchMs < curr.cogMs + state.prev.cacheMs && window > 1)
          window -= 1
      }
    } else {
      window += 1
      saved = window
    }

    if (window > config.cap) {
      window = config.capTo
      saved = config.capTo - 1
    }

    // Shift registers: current batch becomes prev; its cache cost is filled
    // in by the caller once measured (recordCacheTime).
    State(window, saved, curr, state.prev)
  }

  /** Record the cache-update cost of the batch just advanced over — the
    * reference measures it after the controller ran (`:543-587` vs `:462`).
    */
  def recordCacheTime(state: State, cacheMs: Double): State =
    state.copy(prev = state.prev.copy(cacheMs = cacheMs))

  /** DSim-final's LOAD-BALANCING window rule — the third reference
    * controller variant (`DSim-Join/src/main/scala/ds_join/
    * DS_SimJoin_stream.scala:649-666`): after warmup the window is set
    * DIRECTLY from the batch's incoming query count — light batches afford
    * a long window (cache more, maintenance is cheap relative to the
    * batch), heavy batches shrink it (state work competes with query
    * work). Thresholds are the reference's, strict inequalities included:
    * counts landing exactly on a boundary leave the window unchanged.
    */
  final case class QueryCountConfig(
      warmupBatches: Int = 30,
      lowCount: Int = 30,
      longWindow: Int = 50,
      midLoCount: Int = 50,
      midHiCount: Int = 150,
      midWindow: Int = 40,
      highCount: Int = 150,
      shortWindow: Int = 30)

  /** myNapp_v1's cache-SIZE heuristic (`DS-Join/myNapp_v1/src/main/scala/
    * com/myApp/streaming_cache.scala:349-451`) — the oldest reference
    * policy variant, superseded by step4's hill-climb but kept in the
    * family for completeness. Instead of a sliding age WINDOW it advances
    * an eviction FRONTIER (the lowest retained last-seen epoch,
    * `delCacheNum`) by a self-tuning batch count (`numDelCacheCount`),
    * steering toward a target cache size (`properCachedDataCount`) that
    * relaxes toward the observed size:
    *
    *   - clean when cache-side cost rose more than the fetch-side cost
    *     moved (`:368-379`), or — if cache cost fell — when the fall is
    *     smaller than the previous rise (`:375-377`);
    *   - never during the first `warmupBatches` batches (`:383-385`);
    *   - cleaning widens the eviction step while the cache sits above
    *     target (else narrows, floor 1; `:391-396`), halves the target
    *     toward the observed size on each non-consecutive clean
    *     (`:399-401`), and resets the step to 1 if it would evict every
    *     remaining epoch (`:403-405`).
    */
  final case class SizeHeuristicConfig(
      warmupBatches: Int = 10,
      initialProperCount: Long = -1) // <0: seed from first observed count

  final case class SizeHeuristicState(
      frontier: Long = 0, // lowest retained epoch; evict last_seen < frontier
      numDel: Int = 1,
      properCount: Long = -1,
      prevDiff: Double = 0.0,
      continuous: Boolean = false,
      countOld: Long = 0,
      countNew: Long = 0)

  /** One cache-size-heuristic step. `curr` = this batch's cog+fetch;
    * `reg1`/`reg2` = the last two completed batches' registers (cache cost
    * enters one batch late, like [[advance]]); `cacheCount` = cache rows
    * after the LAST batch's update.
    */
  def advanceBySizeHeuristic(
      st: SizeHeuristicState,
      cfg: SizeHeuristicConfig,
      batchId: Long,
      curr: Timings,
      reg1: Timings,
      reg2: Timings,
      cacheCount: Long): SizeHeuristicState = {
    val proper =
      if (st.properCount >= 0) st.properCount
      else if (cfg.initialProperCount >= 0) cfg.initialProperCount
      else cacheCount
    val cacheDiff = (curr.cogMs - reg1.cogMs) + (reg1.cacheMs - reg2.cacheMs)
    val dbDiff = math.abs(curr.fetchMs - reg1.fetchMs)
    val clean =
      batchId > cfg.warmupBatches &&
        (if (cacheDiff > 0) cacheDiff > dbDiff else st.prevDiff > -cacheDiff)

    val base = st.copy(
      prevDiff = cacheDiff,
      properCount = proper,
      countOld = st.countNew,
      countNew = cacheCount)
    if (!clean) base.copy(continuous = false)
    else {
      var numDel =
        if (st.countNew > proper) st.numDel + 1
        else if (st.numDel != 1) st.numDel - 1
        else st.numDel
      val newProper =
        if (!st.continuous) (proper + st.countOld) / 2 else proper
      if (batchId - st.frontier <= numDel) numDel = 1
      base.copy(
        frontier = st.frontier + numDel,
        numDel = numDel,
        properCount = newProper,
        continuous = true)
    }
  }

  /** One query-count-rule step (timing registers still shift so policies
    * can be swapped mid-stream without losing history).
    */
  def advanceByQueryCount(
      state: State,
      qc: QueryCountConfig,
      batchId: Long,
      queryCount: Long,
      curr: Timings = Timings.zero): State = {
    var window = state.window
    if (batchId > qc.warmupBatches) {
      if (queryCount < qc.lowCount) window = qc.longWindow
      else if (queryCount > qc.midLoCount && queryCount < qc.midHiCount) window = qc.midWindow
      else if (queryCount > qc.highCount) window = qc.shortWindow
      if (window < 1) window = 1 // reference clamp (`:656-658`)
    } else {
      window += 1 // pre-warmup growth (`:662-665`)
    }
    State(window, window, curr, state.prev)
  }
}

/** Which controller drives the caching window (reference variants:
  * step4's timing hill-climb vs DSim-final's query-count rule).
  */
sealed trait WindowRule

/** Timing hill-climb ([[AdaptiveWindowController.advance]]) — the default. */
case object HillClimbRule extends WindowRule

/** Query-count load balancing ([[AdaptiveWindowController.advanceByQueryCount]]). */
final case class QueryCountRule(
    config: AdaptiveWindowController.QueryCountConfig =
      AdaptiveWindowController.QueryCountConfig()) extends WindowRule

/** myNapp_v1's cache-size heuristic ([[AdaptiveWindowController.advanceBySizeHeuristic]]):
  * an eviction frontier advanced by a self-tuning step toward a target
  * cache size — the oldest reference policy variant, for completeness.
  */
final case class CacheSizeRule(
    config: AdaptiveWindowController.SizeHeuristicConfig =
      AdaptiveWindowController.SizeHeuristicConfig()) extends WindowRule

/** Constant caching window — the papers' non-adaptive baseline (the
  * fixed-interval configuration the adaptive controllers are evaluated
  * AGAINST), and the deterministic-work control for benchmarking: the
  * timing rules feed measured latencies back into eviction volume, so
  * their total work varies run-to-run by construction (q41's observed
  * 33-66 s solo spread at idle-sentinel load); a fixed window removes the
  * feedback loop entirely.
  */
final case class FixedRule(window: Int) extends WindowRule
