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

/** Constant caching window — the papers' non-adaptive baseline (the
  * fixed-interval configuration the adaptive controllers are evaluated
  * AGAINST), and the deterministic-work control for benchmarking: the
  * timing rules feed measured latencies back into eviction volume, so
  * their total work varies run-to-run by construction (q41's observed
  * 33-66 s solo spread at idle-sentinel load); a fixed window removes the
  * feedback loop entirely.
  */
final case class FixedRule(window: Int) extends WindowRule
