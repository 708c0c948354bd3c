package graft

import java.io.PrintWriter
import java.net.ServerSocket

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.core.Tables
import graft.streaming.{AdaptiveWindowController, CacheManager, Sources}

/** SURVEY S1 exercised on a REAL live source: the reference's topology is
  * 4–8 raw TCP text feeds unioned
  * (`DS-Join/DS_join_step4/src/main/scala/streaming.scala:139-159`); every
  * other spec drives the per-batch logic from staged files or rate
  * sources. Here two live server sockets feed `Sources.socketUnion`
  * through the SAME `CacheManager.processBatch` loop q17 uses, and the
  * accumulated output must equal the plain batch join — the bag-semantics
  * invariant is source-agnostic.
  */
class SocketSourceSpec extends SparkSpec {
  init()

  test("semi-stream join fed from live socket sources equals the batch join") {
    val li = Tables(spark, sfSmoke, "lineitem")
      .select(col("l_partkey"), col("l_quantity"))
      .limit(200)
      .collect()

    val servers = Seq.fill(2)(new ServerSocket(0))
    val feeders = servers.zipWithIndex.map { case (ss, i) =>
      new Thread(() => {
        val sock = ss.accept() // Spark's socket source connects as client
        val out = new PrintWriter(sock.getOutputStream, true)
        li.zipWithIndex
          .filter(_._2 % 2 == i)
          .foreach { case (r, _) => out.println(s"${r.getLong(0)},${r.getDouble(1)}") }
        out.flush()
        // leave the connection open: the source treats close as failure
      })
    }
    feeders.foreach { t => t.setDaemon(true); t.start() }

    val part = Tables(spark, sfSmoke, "part").select("p_partkey", "p_brand")
    val cacheSeed = part.filter(pmod(col("p_partkey"), lit(10)) < 3)
    val manager = new CacheManager(
      part, cacheSeed, "p_partkey",
      AdaptiveWindowController.Config(initialWindow = 2, warmupBatches = 1))

    val outDir = java.nio.file.Files.createTempDirectory("graft-socket-out-").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-socket-ckpt-").toString

    val parsed = Sources
      .socketUnion(spark, servers.map(s => ("localhost", s.getLocalPort)))
      .select(
        split(col("value"), ",").getItem(0).cast("long").as("p_partkey"),
        split(col("value"), ",").getItem(1).cast("double").as("l_quantity"))

    val query = parsed.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        manager.processBatch(batch.toDF()) { out =>
          if (!out.isEmpty) out.write.mode("append").parquet(outDir)
        }
        ()
      }
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.ProcessingTime("500 milliseconds"))
      .start()

    def arrived(): Long =
      try spark.read.parquet(outDir).count()
      catch { case _: Exception => 0L } // no files yet

    try {
      val deadline = System.nanoTime() + 120L * 1000000000L
      while (arrived() < li.length && System.nanoTime() < deadline) Thread.sleep(500)
      assert(arrived() == li.length, s"only ${arrived()} of ${li.length} rows arrived in time")
    } finally {
      query.stop()
      manager.close()
      servers.foreach(s => scala.util.Try(s.close()))
    }

    val got = spark.read.parquet(outDir).select("p_partkey", "l_quantity", "p_brand")
    val expected = spark
      .createDataFrame(
        spark.sparkContext.parallelize(li.toSeq),
        new org.apache.spark.sql.types.StructType()
          .add("p_partkey", "long").add("l_quantity", "double"))
      .join(part, "p_partkey")
      .select("p_partkey", "l_quantity", "p_brand")
    assert(got.exceptAll(expected).isEmpty && expected.exceptAll(got).isEmpty)
  }

  test("kafkaUnion wires the standard connector (unavailable in this container — documented gap)") {
    // zero-egress environment: no spark-sql-kafka jar can exist here, so
    // the factory must fail with Spark's missing-data-source error — i.e.
    // it targets exactly the connector a production deployment adds. An
    // end-to-end Kafka spec needs a broker + connector jar (see
    // Sources.kafkaUnion scaladoc); the downstream pipeline is
    // source-agnostic and live-TCP-proven above.
    val e = intercept[Exception] {
      graft.streaming.Sources.kafkaUnion(spark, "localhost:9092", Seq("t")).printSchema()
    }
    val msg = e.getMessage.toLowerCase
    assert(msg.contains("kafka"), e.getMessage)
  }
}
