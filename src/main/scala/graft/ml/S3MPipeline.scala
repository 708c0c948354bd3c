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
  * ==Two execution paths, identical traces.==
  * [[run]] (the DEFAULT) is the BATCHED form: windows are grouped
  * `windowsPerBatch` at a time, each group's window gather + subsequence
  * match + feature point-reads run as a handful of Spark jobs over the
  * WHOLE group ([[graft.operators.SubsequenceMatch.matchEDMany]] — one
  * index pass per group), and labels align through the watermarked
  * interval-join operator ([[graft.streaming.DelayedLabelJoin]], batch
  * mode, with labels truncated to the replay horizon so a label the
  * stream never lived to see stays unobserved, exactly like the queue).
  * The prequential predict/train replay is per-example in window order
  * using the model's local arithmetic
  * ([[OnlineLinearRegression.trainOnLocal]]), which is FP-identical to
  * the distributed form on single-example batches — so the trace equals
  * [[runSequential]]'s bit for bit on this data ([[graft.OnlineMlSpec]]
  * checks it). One caveat keeps that equality empirical rather than
  * by-construction: best-match selection orders by `d2`, an FP sum whose
  * partial-aggregation order differs between the `matchED` and
  * `matchEDMany` plans. Both paths therefore quantize `d2` to
  * [[D2Tolerance]] before the `(d2, start)` ordering, so a last-ulp
  * difference on two near-tied stored matches cannot flip the winner —
  * only a genuine tie closer than the tolerance could, and then `start`
  * breaks it identically in both plans.
  *
  * [[runSequential]] is the reference-faithful per-window loop
  * (`S3M/src/main/scala/kvscala/s3m.scala:79-162` drives its KV-match
  * engine once per live window): several small driver jobs PER WINDOW, so
  * throughput is capped by job-scheduling cadence (~10-50 windows/s)
  * regardless of cluster size. Kept as the fidelity baseline and the
  * equality oracle for the batched path.
  */
object S3MPipeline {

  /** Absolute quantum applied to `d2` before best-match ordering (see the
    * class doc): well above the ulp of any realistic squared-ED value
    * (`d2 ≲ 1e7` → ulp ≈ 1e-9) and well below any meaningful distance
    * difference on this data.
    */
  val D2Tolerance = 1e-6

  /** `(⌊d2/tol⌋, start)` sort keys — the plan-order-robust form of
    * "order by (d2, start)". `1e7 / 1e-6 = 1e13` stays far inside Long.
    */
  private def d2Bucket = floor(col("d2") / lit(D2Tolerance)).cast("long")

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
    * the same examples. Dispatches to the BATCHED path (see object doc).
    */
  def run(
      series: DataFrame,
      storedEnd: Long,
      cfg: Config = Config(),
      windowsPerBatch: Int = 64): Result =
    runBatched(series, storedEnd, cfg, windowsPerBatch)

  /** Batched path: per group of `windowsPerBatch` live windows — one job
    * gathers every window's values, one [[SubsequenceMatch.matchEDMany]]
    * plan matches them all, one job point-reads every matched window's
    * following deltas. Label alignment and the per-example prequential
    * replay happen after the (model-independent) feature extraction; see
    * the object doc for why the trace is identical to [[runSequential]].
    */
  def runBatched(
      series: DataFrame,
      storedEnd: Long,
      cfg: Config = Config(),
      windowsPerBatch: Int = 64): Result = {
    val spark = series.sparkSession
    import cfg._
    import spark.implicits._

    val stored = series.filter(col("idx") < storedEnd).persist()
    val n = series.agg(max("idx")).head().getLong(0) + 1
    stored.count()
    val index = SubsequenceMatch.meanIndex(stored).persist()
    index.count()

    // live window ordinals: window i starts at storedEnd + i·interval
    val starts = Iterator.iterate(storedEnd)(_ + windowInterval)
      .takeWhile(t => t + windowLen + horizon <= n)
      .toVector
    val nWindows = starts.size
    val delay = math.max(1, math.ceil(horizon.toDouble / windowInterval).toInt)

    // ---- model-independent feature extraction, batched ----
    // ordinal -> scaled feature vector (None = match miss / short read)
    val feats = scala.collection.mutable.Map.empty[Long, Array[Double]]
    starts.zipWithIndex.grouped(windowsPerBatch).foreach { group =>
      val ids = group.map { case (t, i) => (i.toLong, t) }
      val idsDf = broadcast(ids.toDF("qid", "t"))

      // every window's values in ONE job
      val qVals = idsDf
        .withColumn("off", explode(sequence(lit(0), lit(windowLen - 1))))
        .withColumn("idx", col("t") + col("off"))
        .join(series.select("idx", "v"), "idx")
        .groupBy("qid")
        .agg(sort_array(collect_list(struct(col("off"), col("v")))).as("w"))
        .select(col("qid"), col("w.v").as("vs"))
        .collect()
        .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
        .toMap
      val queries = ids.flatMap { case (qid, _) =>
        qVals.get(qid).filter(_.length == windowLen).map(qid -> _)
      }

      if (queries.nonEmpty) {
        // best stored match per window: the whole group in ONE plan
        val matches = SubsequenceMatch
          .matchEDMany(stored, index, queries, matchEps, SubsequenceMatch.DefaultWidths)
        val best = matches
          .withColumn(
            "rn",
            row_number().over(org.apache.spark.sql.expressions.Window
              .partitionBy("qid").orderBy(d2Bucket, col("start"))))
          .filter(col("rn") === 1)
          .select(col("qid"), col("start"))

        // following `horizon` deltas of every best match in ONE job
        val deltas = best
          .withColumn("off", explode(sequence(lit(windowLen), lit(windowLen + horizon - 1))))
          .withColumn("idx", col("start") + col("off"))
          .join(stored.select("idx", "v"), "idx")
          .groupBy("qid")
          .agg(sort_array(collect_list(struct(col("off"), col("v")))).as("w"))
          .select(col("qid"), col("w.v").as("ds"))
          .collect()
          .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
          .toMap

        queries.foreach { case (qid, qs) =>
          deltas.get(qid).filter(_.length == horizon).foreach { ds =>
            feats(qid) = (qs ++ ds).map(_ / featureScale)
          }
        }
      }
    }
    val matchedN = feats.size
    val missedN = nWindows - matchedN

    // ---- label alignment through the watermarked interval-join operator
    // (batch mode). Event time = window ordinal (seconds): window i's
    // label becomes observable when window i+delay is pushed; labels past
    // the replay horizon (the stream ended first) never arrive — the
    // filter models the truncation the driver queue gets for free. ----
    val tBase = 1000000000L
    val featRows = feats.toSeq.sortBy(_._1).map { case (i, f) => (i, f.toSeq) }
    if (featRows.isEmpty) {
      stored.unpersist(); index.unpersist()
      return Result(Seq.empty, Double.NaN, Double.NaN, matchedN, missedN)
    }
    val featDf = featRows.toDF("qid", "features")
      .withColumn("ft", timestamp_seconds(lit(tBase) + col("qid")))
    val labelsDf = (0 until nWindows)
      .collect { case i if i + delay <= nWindows - 1 =>
        (i.toLong, starts(i) + windowLen + horizon - 1)
      }
      .toDF("qid", "label_idx")
      .join(series.select(col("idx").as("label_idx"), col("v").as("y")), "label_idx")
      .withColumn("lt", timestamp_seconds(lit(tBase) + col("qid") + delay))
      .select("qid", "lt", "y")
    // bounded collect: ≤ nWindows rows (query-window grain, set by the
    // probe spec, never the stored series) — the prequential model is
    // DRIVER-HELD like the reference's (s3m.scala:97-130), so the replay
    // examples come to it, one bounded relation, not row-grain traffic
    val joined = graft.streaming.DelayedLabelJoin
      .join(featDf, labelsDf, "qid", "ft", "lt", s"$delay seconds")
      .select("qid", "features", "y")
      .orderBy("qid")
      .collect()

    // ---- prequential replay, one example at a time in window order,
    // local arithmetic (FP-identical to the distributed single-row form) ----
    val model = new OnlineLinearRegression(windowLen + horizon, lr, iterations)
    val eval = new PrequentialEvaluator()
    var zeroSse = 0.0
    var zeroN = 0L
    var batchId = 0L
    joined.foreach { r =>
      val f = r.getSeq[Double](1).toArray
      val y = r.getDouble(2)
      batchId += 1
      val pred = model.predictLocal(f)
      eval.record(batchId, (pred - y) * (pred - y), 1)
      zeroSse += y * y
      zeroN += 1
      model.trainOnLocal(Seq((f, y)))
    }

    stored.unpersist(); index.unpersist()
    Result(
      eval.history,
      eval.aggregateMse,
      if (zeroN == 0) Double.NaN else zeroSse / zeroN,
      matchedN,
      missedN)
  }

  /** Reference-faithful per-window loop (see object doc). */
  def runSequential(series: DataFrame, storedEnd: Long, cfg: Config = Config()): Result = {
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
        .orderBy(d2Bucket, col("start"))
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
