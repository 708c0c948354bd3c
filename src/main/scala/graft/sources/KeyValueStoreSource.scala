package graft.sources

import java.util.Collections
import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference, Transform}
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsRuntimeFiltering}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.{EqualTo, Filter, In}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** A point-lookup key-value store connector (DataSource V2), standing in
  * for the reference's remote stored-side database: DS-Join fetches
  * cache-missed keys from MongoDB with executor-side `$or` point queries
  * (`DS-Join/DS_join_step4/src/main/scala/streaming.scala:343-377`), and
  * DSim-Join does the same for signature buckets
  * (`DSim-Join/src/main/scala/ds_join/DS_SimJoin_stream.scala:774-832`).
  * The adaptive caching controller exists BECAUSE those fetches carry
  * per-key round-trip cost — this source reproduces that regime so the
  * controller can be exercised against real fetch latency instead of a
  * free local parquet scan.
  *
  * Store model — the shape every sharded KV service exposes:
  *   - rows are `(key LONG, value STRING)`; values are the raw delimited
  *     payloads the reference keeps unparsed (`streaming.scala:231` holds
  *     `(K, String)` pairs) — parsing stays an engine concern;
  *   - the keyspace is hash-sharded into `nbuckets` immutable bucket
  *     files (`b=NNNNN.kv`), bucket = floorMod(key, nbuckets), published
  *     write-then-rename; `_meta` records the bucket count;
  *   - a point lookup pays `fetch_delay_us` per probed key (the RTT
  *     model); a bulk scan streams with no per-key penalty — exactly the
  *     trade-off (cache more ↔ fetch less) the window controller
  *     navigates.
  *
  * Scan planning — three access paths, most-selective wins:
  *   1. STATIC pushdown ([[SupportsPushDownFilters]]): `key = v` /
  *      `key IN (…)` predicates prune to the buckets holding those keys,
  *      one [[InputPartition]] per needed bucket.
  *   2. RUNTIME filtering ([[SupportsRuntimeFiltering]]): a join whose
  *      build side Spark can materialize (DPP-style) re-plans the scan to
  *      the probed buckets at execution time — the declarative form of
  *      "send only missed keys to the store".
  *   3. Full scan: one partition per bucket — `MongoSpark.load`'s bulk
  *      path (`DS_SimJoin_stream.scala:405-411`).
  *
  * Scale shape: lookups touch ≤ |probe keys| buckets regardless of store
  * size; parallelism = buckets touched; no driver materialization beyond
  * the pushed key set (batch-bounded by construction — it is a
  * micro-batch's cache-miss set, the same set the reference enumerates
  * into its `$or` query).
  *
  * Usage: `spark.read.format("graft.sources.KeyValueStoreSource")
  * .option("path", dir).load()`.
  */
class KeyValueStoreSource extends TableProvider {

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    KeyValueStore.Schema

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table = {
    val path = properties.get("path")
    require(path != null && path.nonEmpty, "KeyValueStoreSource requires option 'path'")
    val delayUs = Option(properties.get("fetch_delay_us")).map(_.toLong).getOrElse(0L)
    new KeyValueStoreTable(path, delayUs)
  }
}

object KeyValueStore {

  val Schema: StructType = StructType(Seq(
    StructField("key", LongType, nullable = false),
    StructField("value", StringType, nullable = false)))

  /** Diagnostics: bucket files opened by readers in this JVM (local-mode
    * test observability for partition pruning; meaningless across a real
    * cluster and used only by specs).
    */
  val bucketsOpened: AtomicLong = new AtomicLong(0L)

  def bucketOf(key: Long, nBuckets: Int): Int = java.lang.Math.floorMod(key, nBuckets)

  /** Build a store from a DataFrame. One shuffle (hash on bucket), each
    * bucket written exactly once (bucket → partition is many-to-one under
    * `repartition(n, __b)`), write-then-rename publication. Values must be
    * newline-free (they are raw delimited payload lines, reference-style).
    */
  def write(df: DataFrame, root: String, keyCol: String, valueCol: String, nBuckets: Int): Unit = {
    require(nBuckets > 0)
    val dir = new java.io.File(root)
    require(
      !dir.exists() || (dir.isDirectory && Option(dir.listFiles()).forall(_.isEmpty)),
      s"store root $root must be absent or an empty directory")
    dir.mkdirs()
    val prepared = df
      .select(col(keyCol).cast("long").as("key"), col(valueCol).cast("string").as("value"))
      .withColumn("__b", pmod(col("key"), lit(nBuckets.toLong)).cast("int"))
    prepared
      .repartition(nBuckets, col("__b"))
      .foreachPartition { rows: Iterator[org.apache.spark.sql.Row] =>
        val byBucket = rows.map { r =>
          // a NULL key would read back as getLong's 0 — a silent key
          // collision, so reject at write time (store contract)
          require(!r.isNullAt(0) && !r.isNullAt(1),
            "KeyValueStore rows must have non-null key and value")
          (r.getInt(2), (r.getLong(0), r.getString(1)))
        }.toSeq.groupBy(_._1)
        byBucket.foreach { case (b, kvs) =>
          val tmp = new java.io.File(root, s".tmp-$b")
          val out = new java.io.PrintWriter(tmp, "UTF-8")
          try kvs.foreach { case (_, (k, v)) =>
            require(!v.contains('\n'), s"value for key $k contains a newline")
            out.println(s"$k\t$v")
          } finally out.close()
          val target = new java.io.File(root, f"b=$b%05d.kv")
          if (!tmp.renameTo(target)) {
            tmp.delete()
            throw new java.io.IOException(s"could not publish $target")
          }
        }
      }
    val meta = new java.io.PrintWriter(new java.io.File(root, "_meta"), "UTF-8")
    try meta.println(s"nbuckets=$nBuckets") finally meta.close()
  }

  private[sources] def readMeta(root: String): Int = {
    val src = scala.io.Source.fromFile(new java.io.File(root, "_meta"), "UTF-8")
    try src.getLines().collectFirst {
      case l if l.startsWith("nbuckets=") => l.stripPrefix("nbuckets=").toInt
    }.getOrElse(sys.error(s"no nbuckets in $root/_meta"))
    finally src.close()
  }

  private[sources] def readBucket(root: String, b: Int): Iterator[(Long, String)] = {
    val f = new java.io.File(root, f"b=$b%05d.kv")
    if (!f.isFile) Iterator.empty
    else {
      bucketsOpened.incrementAndGet()
      val src = scala.io.Source.fromFile(f, "UTF-8")
      // bucket files are store-shard-sized: materialize and close eagerly
      // so no handle outlives the task
      val all = try src.getLines().map { line =>
        val i = line.indexOf('\t')
        (line.substring(0, i).toLong, line.substring(i + 1))
      }.toVector finally src.close()
      all.iterator
    }
  }

  /** Read the store as a DataFrame through the DSv2 connector. */
  def read(spark: SparkSession, root: String, fetchDelayUs: Long = 0L): DataFrame =
    spark.read.format(classOf[KeyValueStoreSource].getName)
      .option("path", root)
      .option("fetch_delay_us", fetchDelayUs.toString)
      .load()

  /** EXECUTOR-SIDE point fetch, the reference's per-partition `$or` query
    * shape (`streaming.scala:343-377` builds one multi-key query per RDD
    * partition): each partition of the probe-key relation groups its keys
    * by bucket, opens each needed bucket once, and pays the per-key RTT —
    * fully distributed, no driver collect, fetch volume ∝ probe keys.
    * Returns (key, value) rows for keys present in the store.
    */
  def fetchByKeys(root: String, keys: DataFrame, keyCol: String, fetchDelayUs: Long = 0L): DataFrame = {
    val spark = keys.sparkSession
    import spark.implicits._
    keys.select(col(keyCol).cast("long")).distinct().as[Long]
      .mapPartitions { it =>
        val nb = readMeta(root)
        val byBucket = it.toSeq.groupBy(k => bucketOf(k, nb))
        byBucket.iterator.flatMap { case (b, ks) =>
          val want = ks.toSet
          if (fetchDelayUs > 0) busyWaitUs(fetchDelayUs * want.size)
          readBucket(root, b).filter { case (k, _) => want(k) }
        }
      }
      .toDF("key", "value")
  }

  /** Deterministic micro-delay (Thread.sleep has ms floor + scheduler
    * jitter at µs scale).
    */
  private[sources] def busyWaitUs(us: Long): Unit = {
    val until = System.nanoTime() + us * 1000
    while (System.nanoTime() < until) {}
  }
}

class KeyValueStoreTable(path: String, delayUs: Long) extends Table with SupportsRead {
  override def name(): String = s"kvstore($path)"
  override def schema(): StructType = KeyValueStore.Schema
  override def capabilities(): java.util.Set[TableCapability] =
    Collections.singleton(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new KeyValueStoreScanBuilder(path, delayUs)
}

class KeyValueStoreScanBuilder(path: String, delayUs: Long)
  extends ScanBuilder with SupportsPushDownFilters {

  private var pushedKeys: Option[Set[Long]] = None
  private var pushed: Array[Filter] = Array.empty

  private def keysOf(f: Filter): Option[Set[Long]] = f match {
    case EqualTo("key", v: Number) => Some(Set(v.longValue()))
    case In("key", vs) if vs.forall(_.isInstanceOf[Number]) =>
      Some(vs.map(_.asInstanceOf[Number].longValue()).toSet)
    case _ => None
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (supported, _) = filters.partition(f => keysOf(f).isDefined)
    supported.flatMap(keysOf).foreach { ks =>
      pushedKeys = Some(pushedKeys.fold(ks)(_ intersect ks))
    }
    pushed = supported
    // everything stays residual: Spark re-applies the predicates post-scan,
    // so pushdown is a pure pruning optimization, never a correctness gate
    filters
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = new KeyValueStoreScan(path, delayUs, pushedKeys)
}

class KeyValueStoreScan(path: String, delayUs: Long, staticKeys: Option[Set[Long]])
  extends Scan with Batch with SupportsRuntimeFiltering {

  // runtime-filter key set (DPP-style): arrives after planning starts,
  // before planInputPartitions — Spark calls filter() then re-plans
  @volatile private var runtimeKeys: Option[Set[Long]] = None

  override def readSchema(): StructType = KeyValueStore.Schema
  override def toBatch: Batch = this
  override def description(): String =
    s"kvstore($path, pushedKeys=${staticKeys.map(_.size).getOrElse(-1)})"

  override def filterAttributes(): Array[NamedReference] =
    Array(Expressions.column("key"))

  override def filter(filters: Array[Filter]): Unit = {
    val sets = filters.flatMap {
      case EqualTo("key", v: Number) => Some(Set(v.longValue()))
      case In("key", vs) if vs.forall(_.isInstanceOf[Number]) =>
        Some(vs.map(_.asInstanceOf[Number].longValue()).toSet)
      case _ => None
    }
    if (sets.nonEmpty) runtimeKeys = Some(sets.reduce(_ intersect _))
  }

  private def effectiveKeys: Option[Set[Long]] = (staticKeys, runtimeKeys) match {
    case (Some(a), Some(b)) => Some(a intersect b)
    case (a, b) => a.orElse(b)
  }

  override def planInputPartitions(): Array[InputPartition] = {
    val nb = KeyValueStore.readMeta(path)
    effectiveKeys match {
      case Some(ks) =>
        // point-lookup plan: one partition per NEEDED bucket, carrying its
        // key subset — fetch work ∝ probe keys, store size irrelevant
        ks.groupBy(k => KeyValueStore.bucketOf(k, nb)).toSeq.sortBy(_._1)
          .map { case (b, keys) =>
            KvInputPartition(path, b, Some(keys.toArray.sorted), delayUs): InputPartition
          }.toArray
      case None =>
        // bulk-scan plan: every bucket, no per-key RTT (the store streams)
        (0 until nb)
          .map(b => KvInputPartition(path, b, None, 0L): InputPartition)
          .toArray
    }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
        new KvReader(partition.asInstanceOf[KvInputPartition])
    }
}

case class KvInputPartition(
    root: String,
    bucket: Int,
    keys: Option[Array[Long]],
    delayUs: Long) extends InputPartition

class KvReader(p: KvInputPartition) extends PartitionReader[InternalRow] {
  private val rows: Iterator[(Long, String)] = {
    p.keys.foreach { ks => if (p.delayUs > 0) KeyValueStore.busyWaitUs(p.delayUs * ks.length) }
    val want = p.keys.map(_.toSet)
    KeyValueStore.readBucket(p.root, p.bucket)
      .filter { case (k, _) => want.forall(_.contains(k)) }
  }
  private var current: (Long, String) = _

  override def next(): Boolean =
    if (rows.hasNext) { current = rows.next(); true } else false

  override def get(): InternalRow =
    InternalRow(current._1, UTF8String.fromString(current._2))

  override def close(): Unit = ()
}
