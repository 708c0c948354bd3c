package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Semi-stream equi-join: join a (micro-)batch of streamed rows against a
  * large stored relation through a bounded cache, fetching only cache-missed
  * keys from the store.
  *
  * Capability re-expressed from the reference's DS-Join
  * (`DS-Join/DS_join_step4/src/main/scala/streaming.scala:234-615`): the
  * reference hand-builds a cogroup that is split three ways (hits, misses,
  * LRU touch set, `:234-241,254,283`), fetches missed keys from MongoDB with
  * executor-side `$or` queries (`:343-377`), joins and unions (`:397,607`).
  *
  * Spark-first restatement: the cogroup splitter is one cached batch used by
  * an `inner` join (hits) and a `left_anti` join (misses); the executor-side
  * keyed fetch is a `left_semi` join against the stored DataFrame — Catalyst
  * pushes the key set down to the parquet scan, which is exactly the
  * "send only missed keys to the store" semi-join reduction, but planned
  * (broadcast when small, shuffled when not) instead of hand-coded.
  *
  * Scale notes (100 TB stored side): the stored relation is only ever touched
  * through `left_semi` on the key column — with a partitioned/bucketed store
  * that is partition-pruned + dynamic-filtered, never a full scan. The cache
  * is a bounded DataFrame (see [[graft.streaming.CacheManager]]) that stays
  * broadcast-able by construction.
  */
object SemiStreamJoin {

  /** Hit/miss splitter (SURVEY J1/J4): one batch, split by cache membership.
    * Caller should persist `batch` if both sides are consumed — Catalyst does
    * not share one shuffle between the inner and anti join.
    */
  final case class Split(hits: DataFrame, misses: DataFrame)

  def split(batch: DataFrame, cache: DataFrame, key: String): Split =
    Split(
      hits = batch.join(cache, Seq(key), "inner"),
      misses = batch.join(cache, Seq(key), "left_anti"))

  /** Result of [[joinWithStore]]: `out` is the joined batch, `fetched` is
    * what a cache manager admits for the next batch (reference `:543-567`).
    * Call `release()` once both have been consumed — the operator persists
    * the batch (consumed by the inner AND anti join) and `fetched` (consumed
    * by the output join AND the cache admission) so neither recomputes; each
    * recompute of `fetched` would be a fresh stored-side scan, which at
    * 100 TB is the whole cost of the operator (reference caches exactly
    * these, `streaming.scala:237,400`).
    */
  final case class JoinResult(out: DataFrame, fetched: DataFrame, release: () => Unit)

  /** Full semi-stream join (SURVEY J1–J7): hits served from cache, missed
    * keys fetched from the stored relation by semi-join reduction, output is
    * the bag union.
    *
    * Invariant: `cache` rows must be complete copies of `stored` rows for
    * their keys (same schema) — a projected or partial cache would silently
    * undercount hits or break the union. Asserted at entry.
    */
  def joinWithStore(
      batch: DataFrame,
      cache: DataFrame,
      stored: DataFrame,
      key: String,
      saltFactors: Option[DataFrame] = None): JoinResult = {
    require(
      cache.columns.sameElements(stored.columns),
      s"cache schema ${cache.columns.mkString(",")} must equal stored schema " +
        s"${stored.columns.mkString(",")} — the cache holds verbatim stored rows")
    joinWithFetch(
      batch, cache, missedKeys => stored.join(missedKeys, Seq(key), "left_semi"), key,
      saltFactors)
  }

  /** [[joinWithStore]] with a PLUGGABLE store fetch: `fetch` receives the
    * distinct missed-key relation and returns the stored rows for those
    * keys (cache-schema'd). This is the seam a remote point-lookup backend
    * plugs into ([[graft.sources.KeyValueStore.fetchByKeys]] — the
    * reference's executor-side `$or` fetch, `DS-Join/DS_join_step4/src/
    * main/scala/streaming.scala:343-377`); the default backend is the
    * Catalyst-planned semi-join above.
    */
  /** `saltFactors` (SURVEY D4, round-13 verdict task 3): an optional
    * measured hot-key factor relation ([[Salting.hotKeyFactors]] shape)
    * applied to the two INNER joins — the ones whose output is a per-key
    * PRODUCT and therefore the ones a celebrity key funnels through a
    * single task. The hit/miss anti-split stays unsalted: its per-key work
    * is linear in the batch rows, and salting an anti join buys nothing
    * for that. None (the default) is byte-for-byte the unsalted plan.
    */
  def joinWithFetch(
      batch: DataFrame,
      cache: DataFrame,
      fetch: DataFrame => DataFrame,
      key: String,
      saltFactors: Option[DataFrame] = None): JoinResult = {
    val b = batch.persist(StorageLevel.MEMORY_AND_DISK)
    def inner(probe: DataFrame, build: DataFrame): DataFrame = saltFactors match {
      case Some(f) => Salting.adaptiveSaltedJoin(probe, build, key, f)
      case None => probe.join(build, Seq(key), "inner")
    }
    val hits = inner(b, cache)
    val misses = b.join(cache, Seq(key), "left_anti")
    val missedKeys = misses.select(key).distinct()
    val fetched = fetch(missedKeys)
      .persist(StorageLevel.MEMORY_AND_DISK)
    require(
      cache.columns.sameElements(fetched.columns),
      s"fetched schema ${fetched.columns.mkString(",")} must equal cache schema " +
        s"${cache.columns.mkString(",")} — the cache holds verbatim stored rows")
    val out = hits.unionByName(inner(misses, fetched))
    JoinResult(out, fetched, () => { b.unpersist(); fetched.unpersist() })
  }
}
