package graft.ml

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Online (warm-start) linear regression trained by per-batch SGD — the
  * S3M learning loop
  * (`S3M/src/main/scala/kvscala/StreamingLinearRegressionWithSGD_dsl.scala:77-173`)
  * on DataFrames: the gradient of each epoch is computed DISTRIBUTED
  * (posexplode of the feature vector → per-dimension sum — one shuffle of
  * n·dim skinny rows), only the dim-sized gradient ever reaches the
  * driver. The model (weights + intercept) is driver state carried across
  * micro-batches, exactly like the reference's `latestModel().weights`
  * warm start (`:153-165`).
  *
  * Deprecated-free re-expression of mllib's `GradientDescent` step:
  *   w ← w − lr/√t · ( avg_i (wᵀxᵢ + b − yᵢ)·xᵢ + reg·w )
  */
final class OnlineLinearRegression(
    val dim: Int,
    lr: Double = 0.1,
    iterations: Int = 5,
    reg: Double = 0.0) {

  private var w: Array[Double] = Array.fill(dim)(0.0)
  private var b: Double = 0.0
  private var step: Int = 0

  def weights: Array[Double] = w.clone()
  def intercept: Double = b

  private def predictCol(features: org.apache.spark.sql.Column) =
    aggregate(
      zip_with(features, typedLit(w.toSeq), (x, wj) => x * wj),
      lit(0.0),
      (acc, x) => acc + x) + b

  /** Add a `prediction` column using the CURRENT model. */
  def predict(df: DataFrame, featuresCol: String = "features"): DataFrame =
    df.withColumn("prediction", predictCol(col(featuresCol)))

  /** Driver-local prediction — the same left-fold-then-intercept order as
    * [[predict]]'s `aggregate(zip_with(...))` column, so the result is
    * FLOATING-POINT-IDENTICAL to the distributed form on the same model.
    */
  def predictLocal(f: Array[Double]): Double = {
    var acc = 0.0
    var j = 0
    while (j < dim) { acc += f(j) * w(j); j += 1 }
    acc + b
  }

  /** Driver-local training pass: the same per-epoch gradient arithmetic as
    * [[trainOn]]. For a SINGLE-example batch the update is FP-identical to
    * the distributed form (a one-row sum has no ordering freedom); for
    * larger batches the gradient sums run in `rows` order, which may differ
    * from the distributed sum order at the last ulp. The batched S3M path
    * trains one example at a time (prequential), so it stays exact.
    */
  def trainOnLocal(rows: Seq[(Array[Double], Double)]): Unit = {
    val n = rows.size
    if (n == 0) return
    var i = 0
    while (i < iterations) {
      step += 1
      val stepLr = lr / math.sqrt(step)
      val grad = Array.fill(dim)(0.0)
      var gradB = 0.0
      rows.foreach { case (f, y) =>
        val err = predictLocal(f) - y
        var j = 0
        while (j < dim) { grad(j) += err * f(j); j += 1 }
        gradB += err
      }
      var j = 0
      while (j < dim) {
        w(j) -= stepLr * (grad(j) / n + reg * w(j))
        j += 1
      }
      b -= stepLr * (gradB / n)
      i += 1
    }
  }

  /** One training pass (`iterations` SGD epochs) over the batch.
    * Mutates the driver-held model.
    */
  def trainOn(df: DataFrame, featuresCol: String = "features", labelCol: String = "label"): Unit = {
    val n = df.count()
    if (n == 0) return
    val cached = df.select(col(featuresCol).as("f"), col(labelCol).cast("double").as("y"))
      .persist()
    cached.count()
    try {
      var i = 0
      while (i < iterations) {
        step += 1
        val stepLr = lr / math.sqrt(step)
        val withErr = cached.withColumn("err", predictCol(col("f")) - col("y"))
        // per-dimension gradient: one narrow shuffle of n·dim rows
        val gradRows: Array[Row] = withErr
          .select(col("err"), posexplode(col("f")).as(Seq("j", "x")))
          .groupBy("j")
          .agg(sum(col("err") * col("x")).as("g"))
          .collect()
        val gradB = withErr.agg(sum("err")).head().getDouble(0) / n
        val grad = Array.fill(dim)(0.0)
        gradRows.foreach(r => grad(r.getInt(0)) = r.getDouble(1) / n)
        var j = 0
        while (j < dim) {
          w(j) -= stepLr * (grad(j) + reg * w(j))
          j += 1
        }
        b -= stepLr * gradB
        i += 1
      }
    } finally { cached.unpersist(); () }
  }
}

/** Driver-side delayed-label queue (reference `s3m.scala:73-130`, SURVEY
  * M9): features observed now become trainable only once their label
  * arrives `delay` windows later. `None` entries model match-miss windows
  * (the reference enqueues nulls) — they are skipped at training time but
  * still consume a queue slot so the label alignment stays correct.
  */
final class DelayedLabelBuffer[F](delay: Int) {
  require(delay >= 1, s"delay must be >= 1: $delay")
  private val q = scala.collection.mutable.Queue.empty[Option[F]]

  /** Push this window's features; returns the features whose label just
    * became observable (those enqueued `delay` pushes ago), if any.
    */
  def push(features: Option[F]): Option[F] = {
    q.enqueue(features)
    if (q.size > delay) q.dequeue() else None
  }

  def size: Int = q.size
}

/** Prequential (test-then-train) evaluation: every batch is FIRST scored
  * with the pre-update model, THEN used for training (reference
  * `s3m.scala:134-157`, SURVEY M11). `warmup` batches are excluded from
  * the aggregate, like the reference's warm-up guard.
  */
final class PrequentialEvaluator(warmup: Int = 0) {
  private val perBatch = scala.collection.mutable.ArrayBuffer.empty[(Long, Double, Long)]

  def record(batchId: Long, mse: Double, n: Long): Unit = { perBatch += ((batchId, mse, n)); () }

  def history: Seq[(Long, Double, Long)] = perBatch.toSeq

  /** Row-weighted MSE over post-warm-up batches. */
  def aggregateMse: Double = {
    val rows = perBatch.drop(warmup)
    val n = rows.map(_._3).sum
    if (n == 0) Double.NaN else rows.map(r => r._2 * r._3).sum / n
  }
}
