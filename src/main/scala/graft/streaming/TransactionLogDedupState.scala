package graft.streaming

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType, StructType}

/** [[DedupStateStore]] on an explicit TRANSACTION LOG — the third backend,
  * proving the scaladoc claim that the parquet-directory impl "maps 1:1
  * onto a transactional table (Delta/Iceberg)" by actually building the
  * table mechanics the claim names (round-13 verdict task 10; no Delta
  * artifacts exist offline, so the log protocol is implemented directly):
  *
  *   - **snapshot** = replay of `_log/<version>.json` commits in order.
  *     Data files carry `batch`/`pb` as ordinary columns; the LOG carries
  *     per-file statistics (`pbs`, bytes) — bucket pruning happens by file
  *     skipping on log stats, Delta/Iceberg's stats-based pruning, then
  *     `pb` predicate pushdown inside the chosen files;
  *   - **append** = stage data files, then ONE atomic log commit
  *     (write-tmp + rename of the next version). A retried batch id
  *     SUPERSEDES the earlier attempt's commit (`REPLACE WHERE
  *     batch = id`) — readers never see the failed attempt;
  *   - **compact** = OPTIMIZE: fold the pending increments (plus any
  *     size-ladder generation, same policy as [[ParquetDedupState]]) into
  *     generation files and commit adds + removes in ONE entry. Readers
  *     therefore NEVER observe the duplicated-state window the directory
  *     impl has — the tombstoned sources merely remain on DISK until…
  *   - **vacuum** = physical deletion of tombstoned files, run after the
  *     commit (the `afterPublish` crash hook sits between commit and
  *     vacuum) and replayed by any later compaction's nothing-pending
  *     path — exactly the directory impl's `_folded` manifest replay,
  *     with the log's `removes` as the manifest.
  *
  * Single-writer per store (the streaming harness's regime): version
  * numbers are allocated by listing; a lost rename race retries the next
  * version.
  */
final class TransactionLogDedupState(
    spark: org.apache.spark.sql.SparkSession,
    dir: String,
    dataSchema: StructType,
    dedupKeys: Seq[String],
    sumCols: Seq[String] = Seq.empty)
  extends DedupStateStore {

  require(
    sumCols.isEmpty ||
      dataSchema.fieldNames.toSet == (dedupKeys ++ sumCols).toSet,
    s"sum-fold stores need schema = keys ++ sumCols: ${dataSchema.fieldNames.toSeq} vs $dedupKeys + $sumCols")

  private val fullSchema = dataSchema.add("batch", LongType).add("pb", IntegerType)
  private val logDir = Paths.get(dir, "_log")
  private val dataDir = Paths.get(dir, "data")
  Files.createDirectories(logDir)
  Files.createDirectories(dataDir)

  private val mapper = new ObjectMapper()

  // ---- log model -----------------------------------------------------

  /** One committed action. `batch` ≥ 0 for appends, the generation id
    * (negative) for compactions; `folded` lists the batch/generation ids a
    * compaction absorbed; `removes` its tombstoned files.
    */
  private case class Commit(
      version: Long,
      batch: Long,
      adds: Seq[AddFile],
      removes: Seq[String],
      folded: Seq[Long])
  private case class AddFile(file: String, pbs: Seq[Int], bytes: Long)

  private def versions(): Seq[Long] =
    Files.list(logDir).iterator().asScala
      .map(_.getFileName.toString)
      .filter(_.endsWith(".json"))
      .map(_.stripSuffix(".json").toLong)
      .toSeq.sorted

  private def readCommit(v: Long): Commit = {
    val node = mapper.readTree(logDir.resolve(f"$v%012d.json").toFile)
    Commit(
      v,
      node.get("batch").asLong(),
      node.get("adds").elements().asScala.map { a =>
        AddFile(
          a.get("file").asText(),
          a.get("pbs").elements().asScala.map(_.asInt()).toSeq,
          a.get("bytes").asLong())
      }.toSeq,
      Option(node.get("removes")).map(_.elements().asScala.map(_.asText()).toSeq)
        .getOrElse(Seq.empty),
      Option(node.get("folded")).map(_.elements().asScala.map(_.asLong()).toSeq)
        .getOrElse(Seq.empty))
  }

  private def writeCommit(batch: Long, adds: Seq[AddFile], removes: Seq[String],
      folded: Seq[Long]): Unit = {
    val root = mapper.createObjectNode()
    root.put("batch", batch)
    val addArr = root.putArray("adds")
    adds.foreach { a =>
      val n = addArr.addObject()
      n.put("file", a.file); n.put("bytes", a.bytes)
      val p = n.putArray("pbs"); a.pbs.foreach(p.add)
    }
    val remArr = root.putArray("removes"); removes.foreach(remArr.add)
    val fldArr = root.putArray("folded"); folded.foreach(fldArr.add)
    val bytes = mapper.writeValueAsBytes(root)
    var v = versions().lastOption.getOrElse(0L) + 1
    var done = false
    while (!done) {
      val tmp = Files.createTempFile(logDir, ".commit-", ".tmp")
      Files.write(tmp, bytes)
      try {
        Files.move(tmp, logDir.resolve(f"$v%012d.json"),
          StandardCopyOption.ATOMIC_MOVE)
        done = true
      } catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          Files.deleteIfExists(tmp); v += 1 // lost a race: next version
      }
    }
  }

  /** The live snapshot: per surviving append/compaction, its alive files.
    * A later append commit for the same batch id supersedes the earlier
    * one; a compaction's removes tombstone files wherever they came from.
    */
  private case class Snapshot(live: Seq[(Long, AddFile)], tombstoned: Set[String]) {
    def liveFiles: Set[String] = live.map(_._2.file).toSet
  }

  private def snapshot(): Snapshot = {
    val commits = versions().map(readCommit)
    val removed = commits.flatMap(_.removes).toSet
    val superseded = commits.filter(_.batch >= 0).groupBy(_.batch).values
      .flatMap(cs => cs.sortBy(_.version).dropRight(1))
      .flatMap(_.adds.map(_.file)).toSet
    val dead = removed ++ superseded
    val live = commits.flatMap(c => c.adds.collect {
      case a if !dead.contains(a.file) => c.batch -> a
    })
    Snapshot(live, dead)
  }

  // ---- data-file staging ----------------------------------------------

  /** pb values that Spark's hash partitioning routes to each shuffle
    * partition index — computed ONCE per (store, partition count) with one
    * tiny local job over the pb domain, so per-file `pbs` stats come from
    * the write LAYOUT instead of a per-append read-back job (measured
    * ~4 s/batch on the q243 gate). The per-file set is a SUPERSET of the
    * pbs actually present (file skipping stays correct, merely coarser —
    * the trade a stats-collecting table makes when it clusters by hash).
    */
  private val pbDomainMax = 4096
  private val partitionPbs = collection.mutable.Map[Int, Map[Int, Seq[Int]]]()
  private def pbsOfPartition(numParts: Int): Map[Int, Seq[Int]] =
    partitionPbs.getOrElseUpdate(numParts, {
      import spark.implicits._
      (0 until pbDomainMax).toDF("pb")
        .select(col("pb"), pmod(hash(col("pb")), lit(numParts)).as("part"))
        .collect()
        .map(r => r.getInt(1) -> r.getInt(0)).groupBy(_._1)
        .view.mapValues(_.map(_._2).toSeq.sorted).toMap
    })

  /** Write `df` (fullSchema columns) as data files and return their log
    * stats (per-file pb supersets from the hash-partition map).
    */
  private def stage(df: DataFrame): Seq[AddFile] = {
    val staging = Files.createTempDirectory(dataDir, ".staging-")
    val numParts = spark.conf.get("spark.sql.shuffle.partitions").toInt
    df.repartition(numParts, col("pb"))
      .write.mode("overwrite").parquet(staging.toString)
    val layout = pbsOfPartition(numParts)
    val moved = Files.list(staging).iterator().asScala
      .filter(p => p.getFileName.toString.endsWith(".parquet"))
      .toSeq.sortBy(_.getFileName.toString)
      .flatMap { p =>
        // part files are named part-<taskIndex>-…; the task index IS the
        // shuffle partition the pb hash routed to
        val idx = p.getFileName.toString.stripPrefix("part-").take(5).toInt
        val pbs = layout.getOrElse(idx, Seq.empty)
        if (pbs.isEmpty || Files.size(p) == 0L) { Files.delete(p); None }
        else {
          val name = s"f-${java.util.UUID.randomUUID().toString}.parquet"
          val bytes = Files.size(p)
          Files.move(p, dataDir.resolve(name), StandardCopyOption.ATOMIC_MOVE)
          Some(AddFile(name, pbs, bytes))
        }
      }
    // clear staging remnants (_SUCCESS etc.)
    Files.walk(staging).sorted(java.util.Comparator.reverseOrder[Path]())
      .forEach(p => { Files.deleteIfExists(p); () })
    moved
  }

  private def readFiles(files: Seq[String]): DataFrame =
    if (files.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], fullSchema)
    else
      spark.read.schema(fullSchema)
        .parquet(files.map(f => dataDir.resolve(f).toString): _*)

  // ---- DedupStateStore ------------------------------------------------

  override def read(batchId: Long, buckets: Seq[Int]): DataFrame = {
    val bs = buckets.toSet
    // file skipping on log stats (Delta-style), then predicate pushdown
    val files = snapshot().live.collect {
      case (b, a) if b < batchId && a.pbs.exists(bs.contains) => a.file
    }
    readFiles(files).filter(col("batch") < lit(batchId) && col("pb").isin(buckets: _*))
  }

  override def append(df: DataFrame, batchId: Long): Unit = {
    val adds = stage(df.withColumn("batch", lit(batchId))
      .select(fullSchema.fieldNames.map(col).toSeq: _*))
    writeCommit(batchId, adds, Seq.empty, Seq.empty)
    StateTelemetry.record(StateTelemetry.StatePoint(
      dir, batchId, df.count(),
      snapshot().live.map(_._2.bytes).sum,
      liveBatchIds().distinct.size.toLong))
  }

  override def compact(upTo: Long, afterPublish: () => Unit): Unit = {
    val gen = -upTo
    val snap = snapshot()
    val pending = snap.live.filter { case (b, _) => b >= 0 && b < upTo }
    if (pending.isEmpty) { vacuum(); return } // nothing to fold — but a
    // crashed earlier compaction may still owe physical deletes (VACUUM)

    // size-tiered ladder on LOG bytes, same policy as the directory impl
    var foldBytes = pending.map(_._2.bytes).sum
    val gens = snap.live.filter { case (b, _) => b < 0 && b != gen }
      .groupBy(_._1).view.mapValues(_.map(_._2)).toSeq
      .sortBy { case (_, fs) => fs.map(_.bytes).sum }
    val foldedGens = collection.mutable.Buffer[(Long, Seq[AddFile])]()
    gens.foreach { case (g, fs) =>
      val sz = fs.map(_.bytes).sum
      if (sz <= foldBytes) { foldedGens += ((g, fs)); foldBytes += sz }
    }
    val foldedFiles = pending.map(_._2) ++ foldedGens.flatMap(_._2)
    val foldedIds = (pending.map(_._1) ++ foldedGens.map(_._1)).distinct

    val pendingDf = readFiles(foldedFiles.map(_.file))
    val consolidated =
      if (sumCols.isEmpty) pendingDf.dropDuplicates(dedupKeys)
      else pendingDf
        .groupBy((dedupKeys :+ "pb").map(col): _*)
        .agg(
          sum(col(sumCols.head)).cast(dataSchema(sumCols.head).dataType).as(sumCols.head),
          sumCols.tail.map(c =>
            sum(col(c)).cast(dataSchema(c).dataType).as(c)): _*)
        .select(fullSchema.fieldNames.filterNot(_ == "batch").map(col).toSeq: _*)
    val adds = stage(consolidated.withColumn("batch", lit(gen))
      .select(fullSchema.fieldNames.map(col).toSeq: _*))
    // publish: adds + removes in ONE atomic commit — readers never see
    // the duplicated window the directory impl allows
    writeCommit(gen, adds, foldedFiles.map(_.file), foldedIds)
    afterPublish()
    vacuum()
  }

  /** Physically delete tombstoned data files (Delta's VACUUM). Idempotent;
    * replays after any crash between commit and deletion.
    */
  private def vacuum(): Unit = {
    val t = snapshot().tombstoned
    t.foreach(f => Files.deleteIfExists(dataDir.resolve(f)))
  }

  /** Batch/generation ids with PHYSICAL files on disk — the spec's
    * `live()` view (physical presence, so the post-commit pre-vacuum
    * crash window is observable the way the directory impl's is).
    */
  def liveBatchIds(): Seq[Long] = {
    val owner = versions().map(readCommit)
      .flatMap(c => c.adds.map(a => a.file -> c.batch)).toMap
    Files.list(dataDir).iterator().asScala
      .map(_.getFileName.toString)
      .filter(_.endsWith(".parquet"))
      .flatMap(owner.get)
      .toSeq.distinct.sorted
  }

  /** TEST HOOK — physically delete one batch's files (a partially
    * completed vacuum), mirroring the directory impl's dir removal.
    */
  def dropBatchFiles(batch: Long): Unit = {
    val owner = versions().map(readCommit)
      .flatMap(c => c.adds.map(a => a.file -> c.batch)).toMap
    owner.collect { case (f, b) if b == batch => f }
      .foreach(f => Files.deleteIfExists(dataDir.resolve(f)))
  }
}

object TransactionLogDedupState {
  /** Registry so specs can reach the live/drop hooks through the dir key. */
  private val instances = collection.concurrent.TrieMap[String, TransactionLogDedupState]()

  def factory: StreamingDedup.StateStoreFactory = (s, dir, schema, keys) => {
    val st = new TransactionLogDedupState(s, dir, schema, keys)
    instances(dir) = st
    st
  }

  def sumFactory: StreamingDedup.StateStoreFactory = (s, dir, schema, keys) => {
    val st = new TransactionLogDedupState(
      s, dir, schema, keys,
      sumCols = schema.fieldNames.filterNot(keys.contains).toSeq)
    instances(dir) = st
    st
  }

  def liveBatches(dir: String): Seq[Long] =
    instances.get(dir).map(_.liveBatchIds()).getOrElse(Seq.empty)

  def dropBatch(dir: String, batch: Long): Unit =
    instances.get(dir).foreach(_.dropBatchFiles(batch))
}
