package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Stream source factory (SURVEY S1) and metrics listener (S10).
  *
  * The reference opens 4–8 parallel socket text streams and unions them
  * (`DS-Join/DS_join_step4/src/main/scala/streaming.scala:139-159`);
  * Structured Streaming's equivalent is N source DataFrames unioned into
  * one logical stream — the per-batch logic downstream (`foreachBatch`,
  * [[CacheManager]]) is source-agnostic.
  */
object Sources {

  /** N parallel rate sources unioned (the dev/test stand-in for the
    * reference's socket fan-in; swap `format("socket")`/kafka per source
    * in production — same shape). Columns: (ts TIMESTAMP, value LONG,
    * source_id INT).
    */
  def rateUnion(spark: SparkSession, sources: Int, rowsPerSecond: Int): DataFrame = {
    require(sources >= 1)
    val streams = (0 until sources).map { i =>
      spark.readStream
        .format("rate")
        .option("rowsPerSecond", rowsPerSecond)
        .load()
        .withColumn("source_id", lit(i))
    }
    streams.reduce(_ unionByName _)
      .select(col("timestamp").as("ts"), col("value"), col("source_id"))
  }

  /** Socket text sources unioned — the literal reference topology. Only
    * usable against live TCP feeds; tests use [[rateUnion]] or the staged
    * file source.
    */
  def socketUnion(spark: SparkSession, hostPorts: Seq[(String, Int)]): DataFrame =
    hostPorts
      .map { case (h, p) =>
        spark.readStream.format("socket")
          .option("host", h).option("port", p).load()
      }
      .reduce(_ unionByName _)

  /** Kafka topic sources unioned — the production ingest shape
    * (`format("kafka")` is the standard Structured Streaming connector
    * name; the plan is identical to [[socketUnion]]'s with the value bytes
    * cast to text). REQUIRES the `spark-sql-kafka-0-10` connector jar on
    * the classpath at runtime: this build environment has no Kafka
    * artifacts and no network egress, so the method is wiring-only here —
    * it raises Spark's standard missing-data-source error until the
    * connector is deployed alongside the engine, and everything downstream
    * ([[SemiStreamRuntime]], [[CacheManager]]) is already source-agnostic
    * (proven end-to-end for live TCP by SocketSourceSpec).
    */
  def kafkaUnion(
      spark: SparkSession,
      bootstrapServers: String,
      topics: Seq[String],
      startingOffsets: String = "latest"): DataFrame =
    topics.zipWithIndex
      .map { case (t, i) =>
        spark.readStream.format("kafka")
          .option("kafka.bootstrap.servers", bootstrapServers)
          .option("subscribe", t)
          .option("startingOffsets", startingOffsets)
          .load()
          .select(
            col("value").cast("string").as("value"),
            lit(i).as("source_id"))
      }
      .reduce(_ unionByName _)

  /** Metrics snapshot per finished micro-batch (SURVEY S10 — the
    * reference's `data|`/`time|` stdout metrics parsed by `getAVR.py`,
    * re-expressed as a structured listener).
    */
  final case class BatchMetrics(
      batchId: Long,
      inputRows: Long,
      processedRowsPerSecond: Double,
      durationMs: Long)

  /** Attach a listener that records per-batch metrics for `queryName`.
    * Returns the (mutable, thread-safe) buffer and a detach handle.
    */
  def attachMetricsListener(
      spark: SparkSession): (java.util.concurrent.ConcurrentLinkedQueue[BatchMetrics], () => Unit) = {
    val buf = new java.util.concurrent.ConcurrentLinkedQueue[BatchMetrics]()
    val listener = new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val p = e.progress
        buf.add(BatchMetrics(
          p.batchId,
          p.numInputRows,
          p.processedRowsPerSecond,
          Option(p.durationMs.get("triggerExecution")).map(_.longValue()).getOrElse(0L)))
        ()
      }
    }
    spark.streams.addListener(listener)
    (buf, () => spark.streams.removeListener(listener))
  }
}
