package graft.streaming

import scala.collection.mutable.ListBuffer

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.apache.spark.storage.StorageLevel

import graft.operators.SemiStreamJoin

/** Cross-batch cache state for the semi-stream join: a bounded, LRU-evicted
  * cache of stored-side rows plus the adaptive caching-window controller.
  *
  * Re-expresses the reference's cache/LRU machinery
  * (`DS-Join/DS_join_step4/src/main/scala/streaming.scala`):
  *
  *   - LRU upsert (`:421-460`): per batch, every touched key's last-seen
  *     batch id is upserted into the LRU relation via anti-join ∪ union;
  *     after an eviction, entries older than the previous threshold are
  *     dropped in the same pass.
  *   - Eviction (`:543-587`): keys with last-seen < batchId − window leave
  *     the cache; this batch's fetched rows (optionally filtered by an
  *     admission rule, reference `DSim-Join/src/main/scala/ds_join/
  *     DS_SimJoin_stream.scala:838`) enter it. A miss-free batch leaves the
  *     cache untouched (reference `:557-559`).
  *   - Lineage truncation (`:449-451,570-573`): `localCheckpoint` every
  *     `checkpointEvery` batches — cross-batch union/anti-join state grows
  *     an unbounded plan otherwise.
  *   - Adaptive window ([[AdaptiveWindowController]], `:462-540`).
  *
  * The reference overlaps these stages with driver threads; here each batch
  * is one DataFrame DAG — Catalyst pipelines it, and the cache/LRU rotation
  * (materialize new → unpersist old) keeps each state bounded. At cluster
  * scale the state DataFrames are per-executor cached blocks, exactly like
  * the reference's cached RDDs; the admission/eviction joins shuffle
  * cache-sized (not stored-sized) relations, and the stored side is only
  * ever touched through the semi-join reduction on missed keys.
  */
final class CacheManager(
    stored: DataFrame,
    initialCache: DataFrame,
    key: String,
    config: AdaptiveWindowController.Config = AdaptiveWindowController.Config(),
    checkpointEvery: Int = 8,
    admit: DataFrame => DataFrame = identity) {

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
        StructField("last_seen", LongType))))
    .persist(storage)
  private var ctrl = AdaptiveWindowController.initial(config)
  private var evictedLastBatch = false
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
    val r = SemiStreamJoin.joinWithStore(batch, cache, stored, key)
    val missedCount = r.fetched.count() // forces batch persist + split + fetch
    val splitFetchMs = (System.nanoTime() - t0) / 1e6
    // joinWithStore runs split and fetch in one DAG; the controller compares
    // stage sums, and the stored-side fetch dominates whenever misses exist.
    val (cogMs, fetchMs) =
      if (missedCount == 0) (splitFetchMs, 0.0) else (0.0, splitFetchMs)

    consume(r.out)

    // --- LRU upsert (reference :421-460) ---
    val touched = batch
      .select(col(key))
      .distinct()
      .withColumn("last_seen", lit(id))
    val lruBase =
      if (evictedLastBatch) lru.filter(col("last_seen") >= prevThreshold)
      else lru
    val newLru = maybeCheckpoint(
      lruBase.join(touched, Seq(key), "left_anti").unionByName(touched),
      id)
    newLru.count()
    lru.unpersist()
    lru = newLru

    // --- controller (reference :462-540) ---
    ctrl = AdaptiveWindowController.advance(
      ctrl,
      config,
      id,
      AdaptiveWindowController.Timings(cogMs, fetchMs, 0),
      missedCount == 0)
    val threshold = id - ctrl.window

    // --- cache update (reference :543-587) ---
    val tc0 = System.nanoTime()
    if (missedCount > 0) {
      val expiredKeys = lru.filter(col("last_seen") < threshold).select(key)
      val admitted = admit(r.fetched)
      val evicting = expiredKeys.count() > 0
      val updated =
        if (evicting) cache.join(expiredKeys, Seq(key), "left_anti").unionByName(admitted)
        else cache.unionByName(admitted)
      evictedLastBatch = evicting
      if (evicting) prevThreshold = threshold
      val newCache = maybeCheckpoint(updated, id)
      newCache.count()
      cache.unpersist()
      cache = newCache
    } else {
      evictedLastBatch = false
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
    * caller's `count()` before the old one is unpersisted.
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
