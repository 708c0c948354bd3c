package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.core.Tables
import graft.streaming.{AdaptiveWindowController, CacheManager, ReplayLogOffset, ReplayLogSource}

/** The Kafka-shaped DSv2 micro-batch source: offset round-trip,
  * exactly-once delivery across a checkpointed restart, and the q17
  * semi-stream pipeline fed from it (source-agnostic downstream).
  */
class ReplayLogSourceSpec extends SparkSpec {
  init()

  private def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def runToCompletion(log: String, ckpt: String)(
      onBatch: org.apache.spark.sql.DataFrame => Unit): Unit = {
    val q = spark.readStream
      .format("graft.streaming.ReplayLogSource")
      .option("path", log)
      .load()
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        onBatch(df.toDF())
        ()
      }
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    q.stop()
  }

  test("offset JSON round-trips") {
    val o = ReplayLogOffset(Map(0 -> 3L, 2 -> 15L, 10 -> 0L))
    assert(ReplayLogOffset.fromJson(o.json()) == o)
    assert(ReplayLogOffset.fromJson("{}") == ReplayLogOffset(Map.empty))
  }

  test("delivers every appended record exactly once, with provenance") {
    val log = tmpDir("graft-replaylog-")
    ReplayLogSource.append(log, 0, Seq("a0", "a1"))
    ReplayLogSource.append(log, 0, Seq("a2"))
    ReplayLogSource.append(log, 1, Seq("b0", "b1", "b2"))

    val got = collection.mutable.Buffer[(String, Int, Long, Long)]()
    runToCompletion(log, tmpDir("graft-replaylog-ckpt-")) { df =>
      got ++= df.collect().map(r =>
        (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3)))
      ()
    }
    assert(got.sorted == Seq(
      ("a0", 0, 1L, 0L), ("a1", 0, 1L, 1L), ("a2", 0, 2L, 0L),
      ("b0", 1, 1L, 0L), ("b1", 1, 1L, 1L), ("b2", 1, 1L, 2L)).sorted)
  }

  test("restart from checkpoint consumes ONLY files appended after the committed offset") {
    val log = tmpDir("graft-replaylog2-")
    val ckpt = tmpDir("graft-replaylog2-ckpt-")
    ReplayLogSource.append(log, 0, Seq("x0"))
    ReplayLogSource.append(log, 1, Seq("y0"))

    val first = collection.mutable.Buffer[String]()
    runToCompletion(log, ckpt)(df => { first ++= df.collect().map(_.getString(0)); () })
    assert(first.sorted == Seq("x0", "y0"))

    // append while the query is DOWN; the restart must deliver exactly the
    // delta — no replays, no loss
    ReplayLogSource.append(log, 0, Seq("x1", "x2"))
    ReplayLogSource.append(log, 2, Seq("z0")) // a brand-new partition
    val second = collection.mutable.Buffer[String]()
    runToCompletion(log, ckpt)(df => { second ++= df.collect().map(_.getString(0)); () })
    assert(second.sorted == Seq("x1", "x2", "z0"))
  }

  test("semi-stream join fed from the replay log equals the batch join") {
    val li = Tables(spark, sfSmoke, "lineitem")
      .select(col("l_partkey"), col("l_quantity"))
      .limit(300)
      .collect()

    // produce across 3 log partitions, several files each — the Kafka shape
    val log = tmpDir("graft-replaylog3-")
    li.zipWithIndex.groupBy(_._2 % 3).foreach { case (p, rows) =>
      rows.grouped(40).foreach { g =>
        ReplayLogSource.append(log, p, g.map { case (r, _) =>
          s"${r.getLong(0)},${r.getDouble(1)}"
        }.toSeq)
      }
    }

    val part = Tables(spark, sfSmoke, "part").select("p_partkey", "p_brand")
    val cacheSeed = part.filter(pmod(col("p_partkey"), lit(10)) < 3)
    val manager = new CacheManager(
      part, cacheSeed, "p_partkey",
      AdaptiveWindowController.Config(initialWindow = 2, warmupBatches = 1))
    val outDir = tmpDir("graft-replaylog3-out-")

    try {
      val q = spark.readStream
        .format("graft.streaming.ReplayLogSource")
        .option("path", log)
        .load()
        .select(
          split(col("value"), ",").getItem(0).cast("long").as("p_partkey"),
          split(col("value"), ",").getItem(1).cast("double").as("l_quantity"))
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
          manager.processBatch(batch.toDF()) { out =>
            if (!out.isEmpty) out.write.mode("append").parquet(outDir)
          }
          ()
        }
        .option("checkpointLocation", tmpDir("graft-replaylog3-ckpt-"))
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000)
      q.stop()

      val streamed = spark.read.parquet(outDir)
        .select("p_partkey", "l_quantity", "p_brand")
      val expected = spark
        .createDataFrame(
          spark.sparkContext.parallelize(li.toSeq),
          new org.apache.spark.sql.types.StructType()
            .add("p_partkey", "long").add("l_quantity", "double"))
        .join(part, "p_partkey")
        .select("p_partkey", "l_quantity", "p_brand")
      assert(streamed.exceptAll(expected).isEmpty && expected.exceptAll(streamed).isEmpty)
    } finally manager.close()
  }
}
