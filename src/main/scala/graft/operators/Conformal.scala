package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Split-conformal calibration — the distribution-free prediction-set
  * guarantee (Vovk et al. 2005; Angelopoulos & Bates 2023) every modern
  * scoring pipeline wants on top of its point scores: given held-out
  * CALIBRATION nonconformity scores, the threshold
  *   q̂ = the ⌈(n+1)·(1−α)⌉-th smallest calibration score
  * gives P(score_test ≤ q̂) ≥ 1 − α for any exchangeable test point, NO
  * model assumptions. The operator computes q̂ exactly and measures the
  * realized coverage on a test relation in the same pass, so the
  * guarantee ships with its own empirical check (the recall-certificate
  * idiom of q130).
  *
  * Exactness: α = alphaNum/alphaDen rational, so the rank is the exact
  * integer k = ⌈(n+1)·(den−num)/den⌉ = ((n+1)·(den−num) + den − 1) div
  * den, clamped to n (the k > n case means the requested confidence is
  * unreachable at this n — reported via `exact` = false rather than
  * silently shipping the max). Scores must be integral (quantize
  * upstream — the repo-wide histogram contract); q̂ reads off the score
  * histogram's running count, never a sort of data-grain rows.
  *
  * Scale shape: one groupBy to score grain + one [[PrefixSum.exclusive]]
  * block pass for the calibration side (the [[Quantiles]] shape), one
  * broadcast of the single-row threshold against the test aggregate.
  *
  * Output: one row (n_cal, k, q_hat, exact, n_test, n_covered,
  * coverage_ppm) with coverage_ppm = (10⁶·n_covered) div n_test
  * (n_test = 0 → coverage_ppm = 0, n_covered = 0).
  */
object Conformal {

  def calibrate(
      cal: DataFrame,
      test: DataFrame,
      scoreCol: String,
      alphaNum: Long,
      alphaDen: Long): DataFrame = {
    require(alphaNum > 0 && alphaDen > 0 && alphaNum < alphaDen,
      s"Conformal.calibrate: alpha must be in (0,1): $alphaNum/$alphaDen")
    def scores(df: DataFrame) = df.select(col(scoreCol).cast("long").as("v"))
    val hist = scores(cal).groupBy("v").agg(count(lit(1)).as("c"))
    val cum = PrefixSum.exclusive(hist.select(col("v").as("k"), col("c").as("s")))
      .select(col("k").as("v"), col("before"))
    val withCum = hist.join(cum, "v")
      .select(col("v"), (col("before") + col("c")).as("cum"))
    val nCalRow = hist.agg(coalesce(sum("c"), lit(0L))).head()
    val nCal = nCalRow.getLong(0)
    require(nCal > 0, "Conformal.calibrate: empty calibration set")
    val keep = alphaDen - alphaNum
    val kRaw = ((nCal + 1) * keep + alphaDen - 1) / alphaDen
    val k = math.min(kRaw, nCal)
    val thr = withCum.filter(col("cum") >= k)
      .agg(min("v").as("q_hat"))
      .select(
        lit(nCal).as("n_cal"), lit(k).as("k"), col("q_hat"),
        lit(kRaw <= nCal).as("exact"))
    val cov = scores(test)
      .crossJoin(broadcast(thr))
      .agg(
        count(lit(1)).as("n_test"),
        coalesce(sum(when(col("v") <= col("q_hat"), 1L).otherwise(0L)), lit(0L))
          .as("n_covered"))
    thr.crossJoin(broadcast(cov))
      .select(
        col("n_cal"), col("k"), col("q_hat"), col("exact"),
        col("n_test"), col("n_covered"),
        expr("""CASE WHEN n_test = 0 THEN 0L
                ELSE (1000000 * n_covered) div n_test END""").as("coverage_ppm"))
  }
}
