package graft.streaming

import org.apache.hadoop.fs.{FileStatus, FileSystem, FileUtil, Path => HPath}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType, StructType}

/** Durable keyed state for [[StreamingDedup]] — the storage contract behind
  * the seen-set (band signatures + token sets).
  *
  * The interface is the part the 100-TB deployment keeps when the parquet
  * directory layout is swapped for a transactional table (Delta/Iceberg):
  *
  *   - [[read]]    → a snapshot-isolated scan pruned by bucket, hiding any
  *     in-flight batch (`batch < batchId` ≙ reading the last committed
  *     snapshot);
  *   - [[append]]  → an idempotent per-batch upsert keyed by `batchId`
  *     (≙ `REPLACE WHERE batch = id` / a transactional overwrite);
  *   - [[compact]] → table maintenance (`OPTIMIZE` / rewrite-data-files),
  *     folding small per-batch increments so scan metadata stays bounded.
  *
  * Rows carry the data columns plus `pb` (bucket id — the clustering key)
  * and `batch` (visibility watermark).
  */
trait DedupStateStore {

  /** State visible to `batchId`: every committed row (`batch < batchId` —
    * a batch retried after a crash never sees its failed attempt's writes)
    * restricted to the given bucket ids.
    */
  def read(batchId: Long, buckets: Seq[Int]): DataFrame

  /** Write batch `batchId`'s increment (`df` = data columns + `pb`).
    * MUST be idempotent: re-appending the same `batchId` replaces the
    * earlier attempt's rows.
    */
  def append(df: DataFrame, batchId: Long): Unit

  /** Fold committed increments (`batch < upTo`) into a consolidated
    * generation so the partition/file count stops growing with batch
    * count. MUST preserve visibility: folded rows stay visible to every
    * `read(batchId ≥ upTo)` and invisible to none. MUST be crash-safe:
    * interrupted anywhere, a re-run (same or larger `upTo`) converges and
    * no state row is ever lost.
    */
  def compact(upTo: Long): Unit
}

/** Parquet implementation: one directory tree partitioned by
  * `(batch, pb)`.
  *
  * == Layout and visibility ==
  *
  * Per-batch increments land under `batch=<id>/pb=<bucket>`. Compaction
  * folds them into a consolidated GENERATION `batch=-<upTo>` — negative,
  * so the `batch < batchId` visibility predicate keeps matching it for
  * every later batch, while a retried batch `b` still hides exactly its
  * own failed partitions (`batch = b ≥ 0` is never folded: only strictly
  * earlier, checkpoint-committed batches are).
  *
  * == Size-tiered folding ==
  *
  * A compaction folds the pending increments PLUS any existing generation
  * no larger than the bytes being folded (smallest-first). Generations
  * therefore form a geometric-ish ladder: each row is rewritten O(log B)
  * times over B batches — not O(B/K) as a rewrite-everything-every-K
  * scheme would — and the live directory count stays
  * O(compactEvery + log B) instead of O(B). This is LSM merge policy
  * re-expressed as parquet partition folding; on a transactional table the
  * same policy is the engine's OPTIMIZE file-size tiering.
  *
  * == Crash safety ==
  *
  * The fold is written to a sibling staging dir, then published with ONE
  * atomic rename of `batch=-<upTo>` into the tree, then the folded source
  * dirs are deleted. A crash…
  *
  *   - …mid-write leaves an invisible staging dir (cleared on retry);
  *   - …after publish, before the deletes, leaves folded rows visible
  *     TWICE (generation + original dirs). Duplicated state rows are
  *     semantically harmless to the dedup pipeline — candidate pairs are
  *     de-duplicated before verify and decisions are `min`-aggregated —
  *     and every fold runs `dropDuplicates` over the state keys, so later
  *     compactions converge the storage back to one copy;
  *   - …mid-deletes: the retry recomputes the fold from the (shrunken)
  *     listing; the recomputed set is always a subset of the published
  *     one (fewer increments → smaller fold bytes → no extra generation
  *     qualifies), so every dir it deletes is already contained in the
  *     published generation. No row is ever lost.
  */
final class ParquetDedupState(
    spark: SparkSession,
    dir: String,
    dataSchema: StructType,
    dedupKeys: Seq[String])
  extends DedupStateStore {

  private val fullSchema = dataSchema.add("batch", LongType).add("pb", IntegerType)
  private val root = new HPath(dir)
  private def hfs: FileSystem =
    root.getFileSystem(spark.sparkContext.hadoopConfiguration)

  hfs.mkdirs(root)

  /** Explicit schema covers data AND partition columns: no inference pass,
    * and an empty directory is a valid empty relation.
    */
  override def read(batchId: Long, buckets: Seq[Int]): DataFrame =
    spark.read.schema(fullSchema).parquet(dir)
      .filter(col("batch") < lit(batchId) && col("pb").isin(buckets: _*))

  /** One file per (batch, pb) partition: without the repartition every
    * shuffle partition writes its own sliver into every bucket dir — a
    * small-file explosion that taxes each later batch's listing and read.
    * Dynamic partition overwrite keyed by `batchId` makes the write
    * idempotent under batch retry.
    */
  override def append(df: DataFrame, batchId: Long): Unit =
    df.withColumn("batch", lit(batchId))
      .repartition(col("pb"))
      .write
      .mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch", "pb")
      .parquet(dir)

  override def compact(upTo: Long): Unit = compact(upTo, () => ())

  /** `afterPublish` is a TEST HOOK invoked between the generation rename
    * and the source-dir deletes — the widest crash window (state briefly
    * duplicated).
    */
  def compact(upTo: Long, afterPublish: () => Unit): Unit = {
    val gen = -upTo
    val parts = listBatchDirs()
    val incs = parts.filter(p => p.value >= 0 && p.value < upTo)
    if (incs.isEmpty) return // nothing pending (or a retry after the deletes)

    // smallest-first generation ladder: fold any generation no larger
    // than what is being folded anyway
    var foldBytes = incs.map(_.bytes).sum
    val folded = collection.mutable.Buffer(incs: _*)
    parts.filter(p => p.value < 0 && p.value != gen).sortBy(_.bytes).foreach { g =>
      if (g.bytes <= foldBytes) { folded += g; foldBytes += g.bytes }
    }

    val target = new HPath(root, s"batch=$gen")
    if (!hfs.exists(target)) {
      val staging = new HPath(s"$dir.staging$upTo")
      if (hfs.exists(staging)) hfs.delete(staging, true) // crashed mid-write
      spark.read.schema(fullSchema).parquet(dir)
        .filter(col("batch").isin(folded.map(_.value).toSeq: _*))
        .dropDuplicates(dedupKeys)
        .withColumn("batch", lit(gen))
        .repartition(col("pb"))
        .write
        .partitionBy("batch", "pb")
        .parquet(staging.toString)
      val written = new HPath(staging, s"batch=$gen")
      // publish = one atomic rename (same filesystem by construction)
      if (hfs.exists(written) && !hfs.rename(written, target))
        throw new IllegalStateException(s"could not publish compacted generation $written -> $target")
      hfs.delete(staging, true)
    }
    afterPublish()
    folded.foreach(p => hfs.delete(p.path, true))
  }

  /** Live `batch=` partition directories (listing is O(dirs) — the very
    * quantity compaction bounds).
    */
  def listBatchDirs(): Seq[BatchDir] =
    hfs.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("batch="))
      .map { s: FileStatus =>
        BatchDir(
          s.getPath.getName.stripPrefix("batch=").toLong,
          s.getPath,
          hfs.getContentSummary(s.getPath).getLength)
      }
}

final case class BatchDir(value: Long, path: HPath, bytes: Long)

/** Move a staged directory into place, falling back to copy+delete when
  * source and destination live on different filesystems (rename returns
  * false across schemes — e.g. local staging into an HDFS work dir).
  */
object FsMove {
  def into(spark: SparkSession, src: HPath, dst: HPath): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val srcFs = src.getFileSystem(conf)
    val dstFs = dst.getFileSystem(conf)
    val renamed = srcFs.getUri == dstFs.getUri && srcFs.rename(src, dst)
    if (!renamed && !FileUtil.copy(srcFs, src, dstFs, dst, true, conf))
      throw new IllegalStateException(s"could not move $src -> $dst")
  }
}
