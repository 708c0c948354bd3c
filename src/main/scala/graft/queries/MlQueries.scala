package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ml.{OnlineLinearRegression, PrequentialEvaluator}

/** Online-ML query pack: prequential (test-then-train) regression over the
  * events delta stream. Oracled: the SGD recurrence is fully specified
  * (24 full-batch gradient steps at lr/√t from w=0), so a recursive CTE
  * replays the whole trajectory; the distributed gradient sum's float
  * ordering drifts ~1e−12 relative, far below the trace's 4-decimal
  * rounding. Convergence/baseline assertions live in OnlineMlSpec.
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

  // Exact SGD replay: state (w1,w2,w3,b) advanced 24 steps (8 batches x 3
  // epochs) by a recursive CTE; batch b is scored with the state at t=3b
  // (prequential). Assumes every batch nonempty (true at driver SFs - an
  // empty batch would skip a step on the Spark side).
  val oracles: Map[String, String] = Map(
    "q31_online_regression" ->
      """WITH RECURSIVE
        |d AS MATERIALIZED (
        |  SELECT a.event_id AS idx, b.value - a.value AS v
        |  FROM events a JOIN events b ON b.event_id = a.event_id + 1),
        |nn AS (SELECT max(idx) + 1 AS n FROM d),
        |feats AS MATERIALIZED (
        |  SELECT f.idx,
        |         CAST(f.idx // greatest(n // 8, 1) AS INT) AS batch,
        |         l1.v / 100.0 AS x1, l2.v / 100.0 AS x2, l3.v / 100.0 AS x3,
        |         f.v AS y
        |  FROM d f
        |  JOIN d l1 ON l1.idx = f.idx - 1
        |  JOIN d l2 ON l2.idx = f.idx - 2
        |  JOIN d l3 ON l3.idx = f.idx - 3, nn
        |  WHERE f.idx < 8 * greatest(n // 8, 1)),
        |dp(t, w1, w2, w3, bi) AS (
        |  SELECT 0, CAST(0 AS DOUBLE), CAST(0 AS DOUBLE), CAST(0 AS DOUBLE), CAST(0 AS DOUBLE)
        |  UNION ALL
        |  SELECT t + 1,
        |         w1 - 0.3 / sqrt(t + 1) * g1,
        |         w2 - 0.3 / sqrt(t + 1) * g2,
        |         w3 - 0.3 / sqrt(t + 1) * g3,
        |         bi - 0.3 / sqrt(t + 1) * gb
        |  FROM (
        |    SELECT dp.t, dp.w1, dp.w2, dp.w3, dp.bi,
        |           sum((dp.w1*f.x1 + dp.w2*f.x2 + dp.w3*f.x3 + dp.bi - f.y) * f.x1) / count(*) AS g1,
        |           sum((dp.w1*f.x1 + dp.w2*f.x2 + dp.w3*f.x3 + dp.bi - f.y) * f.x2) / count(*) AS g2,
        |           sum((dp.w1*f.x1 + dp.w2*f.x2 + dp.w3*f.x3 + dp.bi - f.y) * f.x3) / count(*) AS g3,
        |           sum(dp.w1*f.x1 + dp.w2*f.x2 + dp.w3*f.x3 + dp.bi - f.y) / count(*) AS gb
        |    FROM dp JOIN feats f ON f.batch = dp.t // 3
        |    WHERE dp.t < 24
        |    GROUP BY dp.t, dp.w1, dp.w2, dp.w3, dp.bi) s)
        |SELECT CAST(f.batch AS BIGINT) AS batch,
        |       count(*) AS n,
        |       round(avg(pow(dp.w1*f.x1 + dp.w2*f.x2 + dp.w3*f.x3 + dp.bi - f.y, 2)), 4) AS mse
        |FROM feats f JOIN dp ON dp.t = 3 * f.batch
        |GROUP BY f.batch
        |ORDER BY batch""".stripMargin)
}
