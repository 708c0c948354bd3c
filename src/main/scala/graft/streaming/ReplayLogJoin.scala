package graft.streaming

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** End-to-end driver gate for the Kafka-shaped [[ReplayLogSource]]: publish
  * a bounded feed into a log directory with the producer protocol
  * (write-then-rename, per-partition sequence numbers), consume it through
  * the DataSource V2 micro-batch path, and join each micro-batch against a
  * stored dimension — the semi-stream ingest shape
  * (`DS-Join/DS_join_step4/src/main/scala/streaming.scala:139-159`'s
  * socket ingest re-expressed on a resumable offset log).
  *
  * The OUTPUT carries the offset provenance (`log_part`, `file_seq`,
  * `line_no`) alongside the joined columns, and the publish layout is a
  * pure function of the feed values:
  *
  *   - log partition  = v mod `parts`,
  *   - file sequence  = (k div 10) mod `filesPerPart` + 1,
  *   - line number    = rank of k within its file (records are published
  *     k-ascending), 0-based,
  *
  * so a SQL oracle replays EXACTLY which (partition, file, line) every
  * record was consumed from — the source's offset semantics become
  * hash-checkable instead of spec-only (round-13 verdict task 4). Empty
  * (partition, file) groups still publish an empty file, keeping actual
  * sequence numbers aligned with the formula.
  *
  * Scale shape: the publish step is a PRODUCER SIMULATION (bounded by the
  * caller's contract — the gate query feeds ≤ 2000 rows), not an engine
  * path; consumption plans one `InputPartition` per published file and the
  * per-batch join is the stored-side equi-join, both cluster-parallel.
  */
object ReplayLogJoin {

  /** @param feed   (k LONG, v LONG) records to publish — BOUNDED by the
    *               caller (collected driver-side to simulate producers)
    * @param stored dimension joined per micro-batch on v = `storedKey`
    * @return one row per consumed record: (k, v, log_part, file_seq,
    *         line_no, stored columns minus the key)
    */
  def run(
      feed: DataFrame,
      stored: DataFrame,
      storedKey: String,
      parts: Int = 3,
      filesPerPart: Int = 2): DataFrame = {
    val spark = feed.sparkSession
    val log = Files.createTempDirectory("graft-replaylog-").toString
    val outDir = Files.createTempDirectory("graft-replaylog-out-").toString
    val ckpt = Files.createTempDirectory("graft-replaylog-ckpt-").toString

    // producer simulation: k-ascending CSV lines, deterministic layout
    val rows = feed
      .select(col("k").cast("long"), col("v").cast("long"))
      .collect() // bounded: the caller's feed contract (gate: ≤ 2000 rows)
      .map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(_._1)
    for (p <- 0 until parts; f <- 1 to filesPerPart) {
      val recs = rows.iterator.filter { case (k, v) =>
        (((v % parts) + parts) % parts).toInt == p &&
          ((k / 10) % filesPerPart + 1).toInt == f
      }.map { case (k, v) => s"$k,$v" }.toSeq
      ReplayLogSource.append(log, p, recs) // empty file keeps seqs aligned
    }

    val query = spark.readStream
      .format("graft.streaming.ReplayLogSource")
      .option("path", log)
      .load()
      .select(
        split(col("value"), ",").getItem(0).cast("long").as("k"),
        split(col("value"), ",").getItem(1).cast("long").as("v"),
        col("partition").as("log_part"),
        col("file_seq"),
        col("line").as("line_no"))
      .writeStream
      .foreachBatch { (b: Dataset[Row], id: Long) =>
        b.join(stored, b("v") === stored(storedKey))
          .drop(storedKey)
          .repartition(1)
          .write.mode("overwrite").parquet(s"$outDir/batch=$id")
        ()
      }
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    query.awaitTermination()

    val out = spark.read.parquet(outDir)
      .drop("batch")
      .transform(graft.core.Materialize.apply)
    Seq(log, outDir, ckpt).foreach(d =>
      SemiStreamRuntime.deleteRecursively(Paths.get(d)))
    out
  }
}
