package graft.streaming

import scala.collection.mutable.ListBuffer

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.apache.spark.storage.StorageLevel

import graft.operators.SemiStreamJoin

/** Pluggable cache-eviction policy (reference DSim-Join ships an LRU-window
  * family plus a cost-balancing variant,
  * `DSim-Join/src/main/scala/ds_join/DS_SimJoin_stream_ver3.scala:501-532`).
  */
sealed trait EvictionPolicy

/** Age-window LRU: keys unseen for `window` batches leave the cache; the
  * window adapts via [[AdaptiveWindowController]]. The reference's default
  * (`DS-Join/DS_join_step4/src/main/scala/streaming.scala:543-587`).
  */
case object LruWindow extends EvictionPolicy

/** Cost-ranked bound: the cache keeps at most `maxEntries` keys, ranked by
  * observed hit frequency then recency — the reference ver3's
  * cost-balancing eviction re-expressed as a top-k keep-set
  * (`DS_SimJoin_stream_ver3.scala:501-532` sorts cached keys by benefit and
  * drops the tail).
  */
final case class CostRanked(maxEntries: Int) extends EvictionPolicy

/** Cross-batch cache state for the semi-stream join: a bounded cache of
  * stored-side rows with a pluggable eviction policy plus the adaptive
  * caching-window controller.
  *
  * Re-expresses the reference's cache/LRU machinery
  * (`DS-Join/DS_join_step4/src/main/scala/streaming.scala`):
  *
  *   - LRU upsert (`:421-460`): per batch, every touched key's last-seen
  *     batch id (and running hit count, for cost policies) is upserted via
  *     ONE full-outer join; entries older than the last eviction threshold
  *     drop out in the same pass.
  *   - Eviction (`:543-587`): [[LruWindow]] drops keys with last-seen <
  *     batchId − window; [[CostRanked]] keeps the top-`maxEntries` keys by
  *     (hits, recency). This batch's fetched rows (optionally filtered by
  *     an admission rule, reference `DSim-Join/src/main/scala/ds_join/
  *     DS_SimJoin_stream.scala:838`) enter the cache. A miss-free batch
  *     leaves the cache untouched (reference `:557-559`).
  *   - Lineage truncation (`:449-451,570-573`): `localCheckpoint` every
  *     `checkpointEvery` batches — cross-batch union/anti-join state grows
  *     an unbounded plan otherwise.
  *   - Adaptive window ([[AdaptiveWindowController]], `:462-540`).
  *
  * Driver round-trips per batch are the latency floor at short trigger
  * intervals (the reference overlapped its stages with threads), so the
  * per-batch DAG is kept to FOUR blocking actions: the fetch count (it
  * gates the miss/no-miss branch and feeds the controller), the joined
  * output consume, and one materializing count per rotated state — the old
  * expired-keys probe is folded into the eviction anti-join (an empty
  * right side is a no-op, no count needed to branch). Fusing the two state
  * counts into one lazy job was tried and REVERTED: the cache plan reads
  * the new LRU, and compiling the unmaterialized LRU subtree into the
  * bigger DAG measured 3× slower per batch. At cluster scale the
  * state DataFrames are per-executor cached blocks, exactly like the
  * reference's cached RDDs; the admission/eviction joins shuffle
  * cache-sized (not stored-sized) relations, and the stored side is only
  * ever touched through the semi-join reduction on missed keys.
  */
final class CacheManager(
    stored: DataFrame,
    initialCache: DataFrame,
    key: String,
    config: AdaptiveWindowController.Config = AdaptiveWindowController.Config(),
    checkpointEvery: Int = 8,
    admit: DataFrame => DataFrame = identity,
    policy: EvictionPolicy = LruWindow,
    windowRule: WindowRule = HillClimbRule,
    // pluggable store backend: receives the distinct missed-key relation,
    // returns the stored rows for those keys (cache-schema'd). None = the
    // Catalyst-planned semi-join against `stored`; Some = e.g. a remote
    // point-lookup connector (KeyValueStore.fetchByKeys), the reference's
    // executor-side `$or` fetch regime
    fetchOverride: Option[DataFrame => DataFrame] = None,
    // measured hot-key salting (SURVEY D4) for the probe joins: a bounded
    // Salting.hotKeyFactors relation; the per-batch inner joins spread
    // each listed key over its factor of sub-partitions (AQE cannot help
    // here — it is disabled under stateful streaming). None = unsalted.
    saltFactors: Option[DataFrame] = None) {

  import CacheManager.BatchStats

  require(
    initialCache.columns.sameElements(stored.columns),
    "cache seed must have the stored relation's schema")

  private val storage = StorageLevel.MEMORY_AND_DISK
  private val spark = stored.sparkSession

  private var cache: DataFrame = initialCache.persist(storage)
  private var lru: DataFrame = spark
    .createDataFrame(
      spark.sparkContext.emptyRDD[Row],
      StructType(Seq(
        StructField(key, initialCache.schema(key).dataType),
        StructField("last_seen", LongType),
        StructField("hits", LongType))))
    .persist(storage)
  private var ctrl = AdaptiveWindowController.initial(config)
  private var sizeState = AdaptiveWindowController.SizeHeuristicState()
  private var lastCacheCount = 0L
  private var prevThreshold = Long.MinValue
  private var batchId = 0L

  val stats: ListBuffer[BatchStats] = ListBuffer.empty

  def currentWindow: Int = ctrl.window
  def cacheSnapshot: DataFrame = cache
  def lruSnapshot: DataFrame = lru

  /** Process one micro-batch: join it against stored-through-cache, hand the
    * joined output to `consume` (e.g. a sink write), then update LRU + cache
    * state and advance the controller. All per-batch intermediates are
    * persisted for the duration and released before returning.
    */
  def processBatch(batch: DataFrame)(consume: DataFrame => Unit): BatchStats = {
    batchId += 1
    val id = batchId

    val t0 = System.nanoTime()
    val r = fetchOverride match {
      case Some(f) => SemiStreamJoin.joinWithFetch(batch, cache, f, key, saltFactors)
      case None => SemiStreamJoin.joinWithStore(batch, cache, stored, key, saltFactors)
    }
    val missedCount = r.fetched.count() // forces batch persist + split + fetch
    val splitFetchMs = (System.nanoTime() - t0) / 1e6
    // joinWithStore runs split and fetch in one DAG; the controller compares
    // stage sums, and the stored-side fetch dominates whenever misses exist.
    val (cogMs, fetchMs) =
      if (missedCount == 0) (splitFetchMs, 0.0) else (0.0, splitFetchMs)

    consume(r.out)

    // --- LRU upsert (reference :421-460), one full-outer join ---
    // Entries below the last eviction threshold left the cache then; they
    // drop out of the LRU here (the old conditional cleanup is a no-op
    // filter when no eviction happened — nothing sat below the threshold).
    val touched = batch
      .select(col(key))
      .distinct()
      .withColumn("t_seen", lit(id))
    val newLru = maybeCheckpoint(
      lru.filter(col("last_seen") >= prevThreshold)
        .join(touched, Seq(key), "full")
        .select(
          col(key),
          coalesce(col("t_seen"), col("last_seen")).as("last_seen"),
          (coalesce(col("hits"), lit(0L)) +
            when(col("t_seen").isNotNull, 1L).otherwise(0L)).as("hits")),
      id)
    // materialize BEFORE the cache update references it: the eviction plan
    // reads the new LRU, and an unmaterialized state subtree would be
    // recompiled and recomputed inside the (bigger) cache DAG — measured
    // 3× slower per batch than two small sequential jobs
    newLru.count()
    lru.unpersist()
    lru = newLru

    // --- controller (reference :462-540, or DSim-final's :649-666) ---
    ctrl = windowRule match {
      case HillClimbRule =>
        AdaptiveWindowController.advance(
          ctrl,
          config,
          id,
          AdaptiveWindowController.Timings(cogMs, fetchMs, 0),
          missedCount == 0)
      case QueryCountRule(qc) =>
        // query_Count (`:642`) = incoming tuples this batch; batch is
        // already persisted by the split/fetch pass, so this is a cheap
        // second action — and the rule is opt-in
        AdaptiveWindowController.advanceByQueryCount(
          ctrl, qc, id, batch.count(),
          AdaptiveWindowController.Timings(cogMs, fetchMs, 0))
      case FixedRule(w) =>
        // non-adaptive baseline: registers still shift (policy can be
        // swapped mid-stream), the window never moves
        ctrl.copy(
          window = w, saved = w,
          prev = AdaptiveWindowController.Timings(cogMs, fetchMs, 0),
          prev2 = ctrl.prev)
      case CacheSizeRule(cfg) =>
        // myNapp_v1's frontier policy expressed in window terms: the
        // eviction threshold (id − window) IS the frontier
        sizeState = AdaptiveWindowController.advanceBySizeHeuristic(
          sizeState, cfg, id,
          AdaptiveWindowController.Timings(cogMs, fetchMs, 0),
          ctrl.prev, ctrl.prev2, lastCacheCount)
        val w = math.max(1L, id - sizeState.frontier)
          .min(Int.MaxValue.toLong).toInt
        ctrl.copy(
          window = w, saved = w,
          prev = AdaptiveWindowController.Timings(cogMs, fetchMs, 0),
          prev2 = ctrl.prev)
    }
    val threshold = id - ctrl.window

    // --- cache update (reference :543-587) ---
    val tc0 = System.nanoTime()
    if (missedCount > 0) {
      val admitted = admit(r.fetched)
      val newCache = policy match {
        case LruWindow =>
          // the expired-keys probe is folded into the anti-join: an empty
          // right side is a no-op, no driver count needed to branch
          val expiredKeys = lru.filter(col("last_seen") < threshold).select(key)
          prevThreshold = threshold
          maybeCheckpoint(
            cache.join(expiredKeys, Seq(key), "left_anti").unionByName(admitted),
            id)
        case CostRanked(maxEntries) =>
          val keep = lru
            .orderBy(col("hits").desc, col("last_seen").desc, col(key))
            .limit(maxEntries)
            .select(key)
          maybeCheckpoint(
            cache.unionByName(admitted).join(keep, Seq(key), "left_semi"),
            id)
      }
      lastCacheCount = newCache.count()
      cache.unpersist()
      cache = newCache
    }
    val cacheMs = (System.nanoTime() - tc0) / 1e6
    ctrl = AdaptiveWindowController.recordCacheTime(ctrl, cacheMs)

    r.release()

    val s = BatchStats(id, missedCount, ctrl.window, cogMs, fetchMs, cacheMs)
    stats += s
    s
  }

  def close(): Unit = {
    cache.unpersist()
    lru.unpersist()
  }

  /** `localCheckpoint` (eager — also persists) on cadence batches, plain
    * persist otherwise; either way the new state is materialized by the
    * caller's action before the old one is unpersisted.
    */
  private def maybeCheckpoint(df: DataFrame, id: Long): DataFrame =
    if (checkpointEvery > 0 && id % checkpointEvery == 0) df.localCheckpoint(true)
    else df.persist(storage)
}

object CacheManager {
  final case class BatchStats(
      id: Long,
      missed: Long,
      window: Int,
      cogMs: Double,
      fetchMs: Double,
      cacheMs: Double)
}
