package graft.ml

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.SubsequenceMatch

/** The full S3M loop (`S3M/src/main/scala/kvscala/s3m.scala:79-162`):
  * slide a live window over a series, subsequence-match it against the
  * stored (historical) prefix, fuse the live deltas with the matched
  * offset's following deltas into one feature vector (SURVEY M7/M8), queue
  * it until its label becomes observable (M9), then prequentially
  * predict-and-train the online model (M10/M11).
  *
  * ==Throughput ceiling — read before reusing at scale.==
  * The loop issues several small Spark jobs PER LIVE WINDOW (window
  * collect, top-1 match, point reads) — faithful to the reference, whose
  * KV-match engine is likewise driver-side per window, but it means
  * throughput is capped by job-scheduling cadence (~10-50 windows/s), not
  * data volume. High-rate deployments should batch many windows per match
  * call ([[graft.operators.SubsequenceMatch.matchED]] accepts the whole
  * candidate set at once) and swap the queue for the watermarked
  * stream-stream form ([[graft.streaming.DelayedLabelJoin]]).
  */
object S3MPipeline {

  final case class Config(
      windowLen: Int = 50,
      windowInterval: Int = 25,
      horizon: Int = 10,
      matchEps: Double = 1e9, // generous: best-match semantics, not a filter
      lr: Double = 0.05,
      iterations: Int = 3,
      featureScale: Double = 100.0)
  // featureScale divides every feature before it reaches the model: raw
  // deltas (±~100 here) would put the gradient curvature far above SGD's
  // stability limit and the loss diverges to ~1e180 within a few windows
  // (observed). A fixed constant keeps the run deterministic.

  final case class Result(
      perWindowMse: Seq[(Long, Double, Long)],
      aggregateMse: Double,
      zeroModelMse: Double,
      matchedWindows: Int,
      missedWindows: Int)

  /** Run the loop over `series` (idx, v): indices < `storedEnd` are the
    * historical/stored side (indexed once), the rest replays as the live
    * stream. Returns the prequential trace plus the zero-model baseline on
    * the same examples.
    */
  def run(series: DataFrame, storedEnd: Long, cfg: Config = Config()): Result = {
    val spark = series.sparkSession
    import cfg._

    val stored = series.filter(col("idx") < storedEnd).persist()
    val n = series.agg(max("idx")).head().getLong(0) + 1
    stored.count()
    val index = SubsequenceMatch.meanIndex(stored).persist()
    index.count()

    val dim = windowLen + horizon
    val model = new OnlineLinearRegression(dim, lr, iterations)
    val delay = math.max(1, math.ceil(horizon.toDouble / windowInterval).toInt)
    val buffer = new DelayedLabelBuffer[(Array[Double], Long)](delay)
    val eval = new PrequentialEvaluator()
    var zeroSse = 0.0
    var zeroN = 0L
    var matched = 0
    var missed = 0

    // live window starts: far enough in that labels exist in the series
    var t = storedEnd
    var batchId = 0L
    while (t + windowLen + horizon <= n) {
      val qs = series
        .filter(col("idx") >= t && col("idx") < t + windowLen)
        .orderBy("idx").select("v").collect().map(_.getDouble(0))

      // best stored match (top-1 by distance; reference takes the engine's
      // best hit) + its following `horizon` deltas (M7 point read)
      val best = SubsequenceMatch
        .matchED(stored, index, qs, matchEps, SubsequenceMatch.DefaultWidths)
        .orderBy(col("d2"), col("start"))
        .limit(1).collect().headOption
      val features: Option[Array[Double]] = best.flatMap { r =>
        val start = r.getLong(0)
        val ds = stored
          .filter(col("idx") >= start + windowLen && col("idx") < start + windowLen + horizon)
          .orderBy("idx").select("v").collect().map(_.getDouble(0))
        if (ds.length == horizon) Some((qs ++ ds).map(_ / featureScale)) else None
      }
      if (features.isDefined) matched += 1 else missed += 1

      // the label for THIS window's features: the delta `horizon` past the
      // window end — it travels WITH the features through the queue and is
      // observable by the time the entry pops `delay` windows later
      val labelIdx = t + windowLen + horizon - 1
      val popped = buffer.push(features.map(f => (f, labelIdx)))

      popped.foreach { case (f, obsLabelIdx) =>
        val label = series.filter(col("idx") === obsLabelIdx)
          .select("v").collect().headOption.map(_.getDouble(0))
        label.foreach { y =>
          batchId += 1
          val df = featureFrame(spark, Seq((f, y)))
          val pred = model.predict(df).select("prediction").head().getDouble(0)
          eval.record(batchId, (pred - y) * (pred - y), 1)
          zeroSse += y * y
          zeroN += 1
          model.trainOn(df)
        }
      }
      t += windowInterval
    }

    stored.unpersist(); index.unpersist()
    Result(
      eval.history,
      eval.aggregateMse,
      if (zeroN == 0) Double.NaN else zeroSse / zeroN,
      matched,
      missed)
  }

  /** (features array<double>, label) DataFrame from driver rows. */
  def featureFrame(spark: SparkSession, rows: Seq[(Array[Double], Double)]): DataFrame = {
    import spark.implicits._
    rows.map { case (f, y) => (f.toSeq, y) }.toDF("features", "label")
  }
}
