package graft.streaming

import java.nio.file.Files

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.operators.{Sampling, Skyline}

/** Streaming Pareto front — the continuous form of [[Skyline]]: each
  * micro-batch close emits the front over everything seen so far (the
  * live "best documents so far" board a curation pass polls).
  *
  * State is the RUNNING FRONT ITSELF, carried through the online-skyline
  * law: front(A ∪ B) = front(front(A) ∪ B) — once a criteria vector is
  * dominated it can never re-enter any later front, so the dominated
  * history is droppable BY THEOREM, not by policy. The carried state is
  * therefore front-sized (not corpus-sized, not census-sized — the
  * smallest state of any consumer in this repo), held as a
  * localCheckpointed plan per batch (the CacheManager cadence; a
  * DedupStateStore would be wrong here — its append-only contract keeps
  * dominated rows forever while the front REMOVES them).
  *
  * ==Crash-resume contract (round-11)==
  * The in-memory front is a cache, not the durable state: the OUTPUT
  * partition `batch=b` IS the front as of batch b, already parquet. On
  * restart (fresh process, `front = None`) the first batch b rebuilds its
  * prior front by reading partition b−1 — which must exist, because the
  * checkpoint only admits batch b after b−1 committed, and b−1's write
  * precedes its commit. Batch writes are dynamic-partition overwrites, so
  * re-running a batch whose write landed but whose commit didn't is
  * idempotent. Recovery I/O is front-sized, like the state itself.
  * Spec-proven by a kill-at-batch / same-root restart run equal to an
  * uninterrupted run.
  *
  * Output: one row per (batch, front vector): (batch, dims…).
  */
object StreamingSkyline {

  /** Run over `df` replayed as `chunks` MD5-assigned micro-batches.
    *
    * @param resumeRoot  reuse this working directory (input staging,
    *                    checkpoint, output) instead of a fresh temp dir —
    *                    the restart handle for crash-resume
    * @param failAtBatch TEST HOOK: throw before processing this batchId,
    *                    simulating a crash (the injected run dies with a
    *                    StreamingQueryException; a second run on the same
    *                    `resumeRoot` without the hook resumes it)
    */
  def run(
      df: DataFrame,
      idCol: String,
      dims: Seq[String],
      chunks: Int = 4,
      buckets: Int = 64,
      resumeRoot: Option[String] = None,
      failAtBatch: Option[Long] = None): DataFrame = {
    require(chunks > 0 && dims.nonEmpty)
    val spark = df.sparkSession

    val root = resumeRoot.getOrElse(
      Files.createTempDirectory("graft-streamsky-").toString)
    val inputDir = s"$root/input"
    val outDir = s"$root/out"
    if (!new java.io.File(inputDir).exists()) {
      val staged = SemiStreamRuntime.stageByColumn(
        df.select((idCol +: dims).map(col): _*)
          .withColumn(
            "__chunk",
            floor(Sampling.hashUniform(col(idCol)) * chunks).cast("int")),
        "__chunk",
        chunks)
      FsMove.into(spark, new HPath(staged.toString), new HPath(inputDir))
    }

    val dimFields = df.select(dims.map(col): _*).schema.fields
    val outSchema = dimFields.foldLeft(new org.apache.spark.sql.types.StructType())(_ add _)
      .add("batch", org.apache.spark.sql.types.LongType)

    var front: Option[DataFrame] = None

    val perBatch: (Dataset[Row], Long) => Unit = { (batch, batchId) =>
      failAtBatch.filter(_ == batchId).foreach { b =>
        throw new IllegalStateException(s"injected failure at batch $b")
      }
      // crash recovery: a fresh process carries no in-memory front — the
      // last committed batch's output partition is the durable copy
      val prior = front.orElse {
        if (batchId == 0L) None
        else Some(
          spark.read.schema(outSchema).parquet(outDir)
            .filter(col("batch") === (batchId - 1))
            .select(dims.map(col): _*))
      }
      val vecs = batch.toDF().select(dims.map(col): _*).distinct()
      val union = prior.map(_.unionByName(vecs).distinct()).getOrElse(vecs)
      // localCheckpoint cuts the growing lineage — the carried plan would
      // otherwise nest one anti-join pair per batch forever
      val next = Skyline.frontVectors(union, dims, buckets).transform(graft.core.Materialize.apply)
      front = Some(next)
      // state telemetry: the running front IS this consumer's state, so
      // its size is the growth curve a deployment alarms on (opt-in,
      // by-name — the count reads the fresh local checkpoint)
      StateTelemetry.record(StateTelemetry.StatePoint(
        outDir, batchId, next.count(), -1L, 1L))
      next.select(lit(batchId).as("batch") +: dims.map(col): _*)
        .write
        .mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch")
        .parquet(outDir)
      ()
    }

    val query = spark.readStream
      .schema(df.select((idCol +: dims).map(col): _*).schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(inputDir)
      .writeStream
      .foreachBatch(perBatch)
      .option("checkpointLocation", s"$root/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    query.awaitTermination()

    spark.read.schema(outSchema).parquet(outDir)
      .select(col("batch") +: dims.map(col): _*)
  }
}
