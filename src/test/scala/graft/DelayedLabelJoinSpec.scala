package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.ml.DelayedLabelBuffer
import graft.streaming.{DelayedLabelJoin, SemiStreamRuntime}

/** The watermarked stream-stream delayed-label join must produce exactly
  * the training pairs the driver-side DelayedLabelBuffer queue produces on
  * the same window sequence (SURVEY M9: queue = faithful form, join =
  * idiomatic form).
  */
class DelayedLabelJoinSpec extends SparkSpec {
  init()

  test("stream-stream join emits the same training pairs as DelayedLabelBuffer") {
    import spark.implicits._
    val nWindows = 40
    val delay = 3 // label for window w arrives at window w + delay

    // deterministic per-window features and labels
    def feat(w: Int): Double = math.sin(w * 0.7) * 10
    def label(w: Int): Double = feat(w) * 2 + 1

    // ---- reference semantics: the driver queue ----
    val buf = new DelayedLabelBuffer[(Int, Double)](delay)
    val viaQueue = (0 until nWindows).flatMap { w =>
      // at window w the label of window w - delay becomes observable
      buf.push(Some((w, feat(w)))).map { case (fw, fv) => (fw, fv, label(fw)) }
    }.toSet

    // ---- idiomatic form: two staged streams + watermarked interval join ----
    val base = java.sql.Timestamp.valueOf("2026-01-01 00:00:00").getTime
    def ts(w: Int) = new java.sql.Timestamp(base + w * 60000L)

    val featureRows = (0 until nWindows)
      .map(w => (w.toLong, ts(w), feat(w), w / 10))
      .toDF("wid", "ftime", "fval", "chunk")
    // the run ends at window nWindows − 1: labels that would arrive later
    // never hit the stream (the queue models the same truncation — tail
    // windows stay un-labeled)
    val labelRows = (0 until nWindows - delay)
      .map(w => (w.toLong, ts(w + delay), label(w), (w + delay) / 10))
      .toDF("wid", "ltime", "y", "chunk")

    val fDir = SemiStreamRuntime.stageByColumn(featureRows, "chunk", 4)
    val lDir = SemiStreamRuntime.stageByColumn(labelRows, "chunk", (nWindows - 1) / 10 + 1)

    val fStream = spark.readStream
      .schema(featureRows.drop("chunk").schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(fDir.toString)
    val lStream = spark.readStream
      .schema(labelRows.drop("chunk").schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(lDir.toString)

    val joined = DelayedLabelJoin.join(
      fStream, lStream, "wid", "ftime", "ltime", s"$delay minutes")

    val outDir = Files.createTempDirectory("graft-dlj-out-").toString
    val ckpt = Files.createTempDirectory("graft-dlj-ckpt-").toString
    val q = joined
      .select("wid", "fval", "y")
      .writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    val viaJoin = spark.read.parquet(outDir)
      .as[(Long, Double, Double)]
      .collect()
      .map { case (w, f, y) => (w.toInt, f, y) }
      .toSet

    assert(viaJoin == viaQueue,
      s"join=${viaJoin.size} pairs, queue=${viaQueue.size}; " +
        s"missing=${viaQueue -- viaJoin} extra=${viaJoin -- viaQueue}")
    // both must drop the tail windows whose labels never became observable
    assert(viaQueue.map(_._1).max == nWindows - delay - 1)
  }
}
