package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ml.{OnlineLinearRegression, PrequentialEvaluator}

/** Online-ML query pack: prequential (test-then-train) regression over the
  * events delta stream — SGD has no SQL form, so the driver records a
  * rows-only check; convergence/baseline assertions live in OnlineMlSpec.
  */
object MlQueries {

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Autoregressive prequential regression (SURVEY M8-M11 shape):
    // features = 3 lagged deltas (equi-join lags, no global window),
    // label = current delta; 8 time-ordered batches, each scored with the
    // pre-update model then trained on. Output: per-batch example count +
    // MSE trace.
    "q31_online_regression" -> ((s, dir) => {
      val series = SeqMatchQueries.deltaSeries(Tables(s, dir, "events")).persist()
      val n = series.agg(max("idx")).head().getLong(0) + 1
      def lagged(k: Int) =
        series.select((col("idx") + k).as("idx"), col("v").as(s"x$k"))
      // features scaled by a fixed 1/100 — raw deltas (±~100) would put
      // the gradient's curvature far above the SGD stability limit and
      // diverge; a constant scale keeps the run deterministic
      val feats = series.select(col("idx"), col("v").as("label"))
        .join(lagged(1), "idx").join(lagged(2), "idx").join(lagged(3), "idx")
        .select(
          col("idx"),
          array(col("x1") / 100.0, col("x2") / 100.0, col("x3") / 100.0).as("features"),
          col("label"))
        .persist()
      feats.count()

      val model = new OnlineLinearRegression(dim = 3, lr = 0.3, iterations = 3)
      val eval = new PrequentialEvaluator()
      val bs = math.max(n / 8, 1)
      val rows = (0 until 8).flatMap { b =>
        val df = feats
          .filter(col("idx") >= b * bs && col("idx") < (b + 1) * bs)
          .persist()
        val cnt = df.count()
        if (cnt == 0) { df.unpersist(); None }
        else {
          val mse = model.predict(df)
            .agg(avg(pow(col("prediction") - col("label"), 2)))
            .head().getDouble(0)
          eval.record(b.toLong, mse, cnt)
          model.trainOn(df)
          df.unpersist()
          Some((b.toLong, cnt, BigDecimal(mse).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble))
        }
      }
      series.unpersist(); feats.unpersist()
      s.createDataFrame(rows).toDF("batch", "n", "mse").orderBy("batch")
    }))

  val oracles: Map[String, String] = Map.empty
}
