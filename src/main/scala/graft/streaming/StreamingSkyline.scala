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
  * Output: one row per (batch, front vector): (batch, dims…).
  */
object StreamingSkyline {

  /** Run over `df` replayed as `chunks` MD5-assigned micro-batches. */
  def run(
      df: DataFrame,
      idCol: String,
      dims: Seq[String],
      chunks: Int = 4,
      buckets: Int = 64): DataFrame = {
    require(chunks > 0 && dims.nonEmpty)
    val spark = df.sparkSession

    val root = Files.createTempDirectory("graft-streamsky-").toString
    val inputDir = s"$root/input"
    val outDir = s"$root/out"
    val staged = SemiStreamRuntime.stageByColumn(
      df.select((idCol +: dims).map(col): _*)
        .withColumn(
          "__chunk",
          floor(Sampling.hashUniform(col(idCol)) * chunks).cast("int")),
      "__chunk",
      chunks)
    FsMove.into(spark, new HPath(staged.toString), new HPath(inputDir))

    var front: Option[DataFrame] = None

    val perBatch: (Dataset[Row], Long) => Unit = { (batch, batchId) =>
      val vecs = batch.toDF().select(dims.map(col): _*).distinct()
      val union = front.map(_.unionByName(vecs).distinct()).getOrElse(vecs)
      // localCheckpoint cuts the growing lineage — the carried plan would
      // otherwise nest one anti-join pair per batch forever
      val next = Skyline.frontVectors(union, dims, buckets).localCheckpoint(true)
      front = Some(next)
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

    val dimFields = df.select(dims.map(col): _*).schema.fields
    val outSchema = dimFields.foldLeft(new org.apache.spark.sql.types.StructType())(_ add _)
      .add("batch", org.apache.spark.sql.types.LongType)
    spark.read.schema(outSchema).parquet(outDir)
      .select(col("batch") +: dims.map(col): _*)
  }
}
