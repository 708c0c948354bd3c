package graft

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ml.{DelayedLabelBuffer, OnlineLinearRegression, PrequentialEvaluator, S3MPipeline}
import graft.queries.SeqMatchQueries

class OnlineMlSpec extends SparkSpec {
  init()

  test("SGD converges on a synthetic linear stream and beats the predict-only baseline") {
    import spark.implicits._
    // y = 2*x0 - 3*x1 + 1, deterministic pseudo-random features
    def batch(b: Int) = spark.range(b * 200, (b + 1) * 200)
      .select(
        array(
          (pmod(xxhash64(col("id")), lit(1000)) / 500.0 - 1.0),
          (pmod(xxhash64(col("id"), lit(1)), lit(1000)) / 500.0 - 1.0)).as("features"))
      .withColumn(
        "label",
        element_at(col("features"), 1) * 2.0 - element_at(col("features"), 2) * 3.0 + 1.0)

    val model = new OnlineLinearRegression(dim = 2, lr = 0.5, iterations = 10)
    val eval = new PrequentialEvaluator()
    var zeroSse = 0.0
    (0 until 10).foreach { b =>
      val df = batch(b).persist()
      val scored = model.predict(df)
        .withColumn("se", pow(col("prediction") - col("label"), 2))
      eval.record(b.toLong, scored.agg(avg("se")).head().getDouble(0), 200)
      zeroSse += df.select(avg(pow(col("label"), 2))).head().getDouble(0)
      model.trainOn(df)
      df.unpersist()
    }
    val h = eval.history.map(_._2)
    assert(h.last < h.head / 10, s"no convergence: $h")
    assert(eval.aggregateMse < zeroSse / 10, "does not beat the predict-zero baseline")
    assert(math.abs(model.weights(0) - 2.0) < 0.5, s"w0=${model.weights(0)}")
    assert(math.abs(model.weights(1) + 3.0) < 0.5, s"w1=${model.weights(1)}")
  }

  test("delayed-label buffer pops entries exactly `delay` pushes later, preserving misses") {
    val buf = new DelayedLabelBuffer[Int](2)
    assert(buf.push(Some(1)).isEmpty)
    assert(buf.push(None).isEmpty)
    assert(buf.push(Some(3)).contains(1))
    assert(buf.push(Some(4)).isEmpty) // the None slot pops as no-train
    assert(buf.push(Some(5)).contains(3))
  }

  test("prequential evaluator excludes warm-up and row-weights batches") {
    val e = new PrequentialEvaluator(warmup = 1)
    e.record(1, 100.0, 10) // warm-up, excluded
    e.record(2, 4.0, 10)
    e.record(3, 1.0, 30)
    assert(math.abs(e.aggregateMse - (4.0 * 10 + 1.0 * 30) / 40) < 1e-12)
  }

  test("batched S3M path reproduces the sequential reference trace exactly") {
    val series = SeqMatchQueries.deltaSeries(Tables(spark, sfSmoke, "events"))
    val n = series.count()
    val cfg = S3MPipeline.Config(windowLen = 50, windowInterval = 50, horizon = 10, iterations = 2)
    val seqR = S3MPipeline.runSequential(series, storedEnd = n / 2, cfg)
    // windowsPerBatch=7 exercises ragged group boundaries
    val batR = S3MPipeline.runBatched(series, storedEnd = n / 2, cfg, windowsPerBatch = 7)
    assert(batR.matchedWindows == seqR.matchedWindows)
    assert(batR.missedWindows == seqR.missedWindows)
    assert(batR.perWindowMse == seqR.perWindowMse,
      s"trace diverged:\n batched=${batR.perWindowMse}\n sequential=${seqR.perWindowMse}")
    assert(batR.aggregateMse == seqR.aggregateMse)
    assert(batR.zeroModelMse == seqR.zeroModelMse)
  }

  test("local single-example SGD update is FP-identical to the distributed form") {
    val f = Array(0.37, -1.25, 0.003)
    val y = 0.8
    val m1 = new OnlineLinearRegression(dim = 3, lr = 0.2, iterations = 4)
    val m2 = new OnlineLinearRegression(dim = 3, lr = 0.2, iterations = 4)
    m1.trainOn(S3MPipeline.featureFrame(spark, Seq((f, y))))
    m2.trainOnLocal(Seq((f, y)))
    assert(m1.weights.toSeq == m2.weights.toSeq)
    assert(m1.intercept == m2.intercept)
    val probe = Array(0.1, 0.2, 0.3)
    assert(
      m1.predict(S3MPipeline.featureFrame(spark, Seq((probe, 0.0))))
        .select("prediction").head().getDouble(0) == m2.predictLocal(probe))
  }

  test("S3M loop runs end-to-end on the sf0.001 events series") {
    val series = SeqMatchQueries.deltaSeries(Tables(spark, sfSmoke, "events"))
    val n = series.count()
    val r = S3MPipeline.run(
      series,
      storedEnd = n / 2,
      S3MPipeline.Config(windowLen = 50, windowInterval = 50, horizon = 10, iterations = 2))
    assert(r.matchedWindows > 0, "no window ever matched the stored side")
    assert(r.perWindowMse.nonEmpty, "no prequential examples were evaluated")
    // "finite" is not enough — a diverging model produces finite-but-1e180
    // losses (seen live); the model must stay in the ballpark of the
    // predict-zero baseline on this noise-like series
    assert(
      r.aggregateMse < r.zeroModelMse * 10,
      s"model diverged: mse=${r.aggregateMse} zero=${r.zeroModelMse}")
  }
}
