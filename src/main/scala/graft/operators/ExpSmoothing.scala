package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exponential smoothing per key, integer-exact — the one-step-ahead
  * baseline forecaster (Brown 1956) for keyed series (daily volumes,
  * per-tenant load): S_t = S_{t−1} + α(x_t − S_{t−1}) with α = 1/2^k.
  * Tracking the level at 2^k SCALE keeps every step integral:
  *   T_1 = x_1·2^k,  T_t = T_{t−1} + (x_t·2^k − T_{t−1}) div 2^k,
  * so the fitted series is engine-exact and a recursive SQL CTE replays
  * it bit-for-bit. Each row reports the PRIOR level — the honest
  * one-step-ahead forecast — and its signed error at the same scale,
  * so Σ|err| is the model's backtest MAE with no second pass.
  *
  * Scale shape: one groupBy to (key, bucket) grain, then the same
  * bounded per-key sorted-array fold as [[Survival]] (state = the
  * key's own series, which is also the output; `maxStepsPerKey` names
  * the contract via [[HotKeyGuard]]). Longs hold x·2^k — k ≤ 20 leaves
  * 2⁴² of value headroom.
  *
  * Output: (k, t, x, forecast_x2k, err_x2k, level_x2k), ascending t
  * per key; the first bucket's forecast is its own value (err 0) by
  * convention.
  */
object ExpSmoothing {

  def ema(
      df: DataFrame,
      keyCol: String,
      bucketCol: String,
      valueCol: String,
      kLog2: Int,
      maxStepsPerKey: Long = Long.MaxValue): DataFrame = {
    require(kLog2 >= 1 && kLog2 <= 20,
      s"ExpSmoothing.ema: kLog2 must be in [1, 20], got $kLog2")
    val scale = 1L << kLog2
    val grain0 = df
      .select(
        col(keyCol).as("k"),
        col(bucketCol).cast("long").as("t"),
        col(valueCol).cast("long").as("x"))
      .groupBy("k", "t")
      .agg(sum("x").as("x"))
    val grain = HotKeyGuard(grain0, col("k"), maxStepsPerKey, "ExpSmoothing.ema")
    grain
      .groupBy("k")
      .agg(sort_array(collect_list(struct(col("t"), col("x")))).as("steps"))
      .withColumn("lv", expr(
        s"""slice(
           |  aggregate(steps, array(element_at(steps, 1).x * ${scale}L),
           |    (acc, s) -> concat(acc,
           |      array(element_at(acc, -1)
           |            + (s.x * ${scale}L - element_at(acc, -1)) div ${scale}L))),
           |  2, size(steps))""".stripMargin))
      .select(col("k"), explode(expr(
        s"""transform(steps, (s, idx) -> struct(
           |  s.t AS t, s.x AS x,
           |  IF(idx = 0, s.x * ${scale}L, element_at(lv, idx)) AS forecast_x2k,
           |  s.x * ${scale}L
           |    - IF(idx = 0, s.x * ${scale}L, element_at(lv, idx)) AS err_x2k,
           |  element_at(lv, idx + 1) AS level_x2k))""".stripMargin)).as("z"))
      .select(
        col("k"),
        col("z.t").as("t"),
        col("z.x").as("x"),
        col("z.forecast_x2k").as("forecast_x2k"),
        col("z.err_x2k").as("err_x2k"),
        col("z.level_x2k").as("level_x2k"))
  }
}
