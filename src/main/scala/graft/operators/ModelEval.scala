package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact evaluation of a scoring model against binary labels — the
  * calibration step between training a quality/domain classifier and
  * turning it into a corpus filter: AUC says whether the score ranks
  * positives above negatives at all; the calibration table says WHERE to
  * put the threshold and what precision each score band buys.
  *
  * Both are EXACT INTEGER computations over integer scores (the repo's
  * classifiers emit integer margins — [[TextClassifier]], [[LmScore]],
  * [[ImportanceResampling]]): no trapezoid floats, no sampled ROC.
  *
  * AUC is the Mann–Whitney pair statistic: over all pos×neg pairs, the
  * fraction with score(pos) > score(neg), ties counting ½ —
  *
  *   auc_bp = ⌊10000·(2·concordant + ties) / (2·n_pos·n_neg)⌋
  *
  * computed from the per-score histogram, never from pairs: concordant =
  * Σ_s np(s)·NN(<s) needs only each score's count of negatives below it —
  * an exclusive prefix sum over the score axis ([[PrefixSum.exclusive]],
  * every window ≤ blockSize rows). Products run in DECIMAL(38,0)
  * (n_pos·n_neg at trillion-doc corpora passes 2⁶³).
  *
  * Scale shape: ONE map-side-combinable groupBy(score) shuffle
  * (histogram-sized output), the recursive prefix roll-up over distinct
  * scores, one bounded final aggregate. Calibration is the same histogram
  * re-bucketed by exact integer range arithmetic — no second corpus scan.
  */
object ModelEval {

  private val dec = "decimal(38,0)"

  /** Per-score histogram: (score, np, nn). `labelCol` must be 0/1. */
  private def histogram(scored: DataFrame, scoreCol: String, labelCol: String): DataFrame =
    scored
      .select(col(scoreCol).cast("long").as("score"), col(labelCol).cast("long").as("y"))
      .groupBy("score")
      .agg(sum("y").as("np"), sum(lit(1L) - col("y")).as("nn"))

  /** Exact Mann–Whitney AUC. Output: single row
    * (n_pos, n_neg, n_concordant, n_tie_pairs, auc_bp).
    * Scores may be negative: the prefix runs over score − min(score)
    * (PrefixSum keys must be non-negative).
    */
  def exactAuc(scored: DataFrame, scoreCol: String, labelCol: String): DataFrame = {
    val h = histogram(scored, scoreCol, labelCol)
    val lo = h.agg(min("score").as("minS"))
    val shifted = h.crossJoin(broadcast(lo))
      .select((col("score") - col("minS")).as("k"), col("np"), col("nn"))
    val below = PrefixSum.exclusive(shifted.select(col("k"), col("nn").as("s")))
      .select(col("k"), col("before").as("nnBelow"))
    shifted
      .join(below, "k")
      .agg(
        sum("np").cast(dec).as("n_pos"),
        sum("nn").cast(dec).as("n_neg"),
        sum(expr(s"cast(np as $dec) * cast(nnBelow as $dec)")).as("n_concordant"),
        sum(expr(s"cast(np as $dec) * cast(nn as $dec)")).as("n_tie_pairs"))
      .select(
        coalesce(col("n_pos"), lit(0)).cast("long").as("n_pos"),
        coalesce(col("n_neg"), lit(0)).cast("long").as("n_neg"),
        coalesce(col("n_concordant"), lit(0)).cast("long").as("n_concordant"),
        coalesce(col("n_tie_pairs"), lit(0)).cast("long").as("n_tie_pairs"),
        // AUC is undefined with a single class present (0 pairs): NULL,
        // not a divide-by-zero throw under ANSI mode
        expr(s"""CASE WHEN n_pos = 0 OR n_neg = 0 THEN NULL
                 ELSE (10000 * (2 * n_concordant + n_tie_pairs))
                      div (2 * n_pos * n_neg) END""").cast("long").as("auc_bp"))
  }

  /** Equi-width calibration table over [min(score), max(score)]:
    * bucket b holds scores in [minS + b·width rounding up, …), width =
    * ceil((maxS − minS + 1)/nBuckets) — exact integer bucketing, top
    * scores land in bucket nBuckets−1. Output per non-empty bucket:
    * (bucket, score_lo, n, n_pos, pos_rate_bp), ordered consumers sort.
    */
  def calibrationBuckets(
      scored: DataFrame,
      scoreCol: String,
      labelCol: String,
      nBuckets: Int): DataFrame = {
    require(nBuckets >= 1, s"nBuckets must be >= 1: $nBuckets")
    val h = histogram(scored, scoreCol, labelCol)
    val bounds = h.agg(min("score").as("minS"), max("score").as("maxS"))
    h.crossJoin(broadcast(bounds))
      .withColumn("width",
        expr(s"(maxS - minS + 1 + ${nBuckets - 1}) div $nBuckets"))
      .withColumn("bucket", expr("(score - minS) div width"))
      .groupBy("bucket")
      .agg(
        min(expr("minS + bucket * width")).as("score_lo"),
        sum(expr("np + nn")).as("n"),
        sum("np").as("n_pos"))
      .withColumn("pos_rate_bp", expr("(10000 * n_pos) div n"))
      .select("bucket", "score_lo", "n", "n_pos", "pos_rate_bp")
  }

  /** Exact average precision — the PR-side companion of [[exactAuc]]
    * (class-imbalanced corpus filters live on the PR curve, not ROC):
    * thresholds at the DISTINCT scores descending (the
    * `average_precision_score` step-function definition — deterministic,
    * no tie-order dependence),
    *
    *   AP = Σ_s (np(s)/n_pos) · (cumP(s) / cumT(s))
    *
    * with cum* = counts at score ≥ s. Emitted as a TERM-FLOORED fixed
    * point, `ap_mbp = (Σ_s np(s)·⌊10⁷·cumP(s)/cumT(s)⌋) div n_pos`
    * (milli-basis-points): each precision term floors once at scale 10⁷,
    * so the number is a well-defined exact integer both engines replay
    * bit-for-bit — the [[LmScore]] fixed-point discipline, trading
    * ≤ 10⁻⁷ per-term bias for oracle-exactness.
    *
    * Scale shape mirrors [[exactAuc]]: one histogram shuffle, one
    * [[PrefixSum]] recursion per axis (positives / totals), bounded
    * final aggregate. Output: one row
    * (n_pos, n, ap_mbp, p_at_all_bp) — p_at_all_bp = base rate, the
    * PR curve's floor.
    */
  def averagePrecision(scored: DataFrame, scoreCol: String, labelCol: String): DataFrame = {
    val h = histogram(scored, scoreCol, labelCol)
    val lo = h.agg(min("score").as("minS"))
    val shifted = h.crossJoin(broadcast(lo))
      .select((col("score") - col("minS")).as("k"), col("np"), col("nn"))
    val pBelow = PrefixSum.exclusive(shifted.select(col("k"), col("np").as("s")))
      .select(col("k"), col("before").as("pBelow"))
    val tBelow = PrefixSum.exclusive(
      shifted.select(col("k"), (col("np") + col("nn")).as("s")))
      .select(col("k"), col("before").as("tBelow"))
    val tot = shifted.agg(
      sum("np").as("totP"), sum(col("np") + col("nn")).as("totT"))
    shifted
      .join(pBelow, "k").join(tBelow, "k")
      .crossJoin(broadcast(tot))
      .select(
        col("np"),
        (col("totP") - col("pBelow")).as("cumP"), // at score ≥ k
        (col("totT") - col("tBelow")).as("cumT"),
        col("totP"), col("totT"))
      .agg(
        first("totP").as("n_pos"),
        first("totT").as("n"),
        // products in DECIMAL(38,0): 10⁷·cumP passes 2⁶³ near 10¹² rows
        sum(expr(s"cast(np as $dec) * ((cast(10000000 as $dec) * cumP) div cumT)"))
          .as("__s"))
      .select(
        col("n_pos").cast("long").as("n_pos"),
        col("n").cast("long").as("n"),
        expr("CASE WHEN n_pos = 0 THEN NULL ELSE __s div n_pos END")
          .cast("long").as("ap_mbp"),
        expr("CASE WHEN n = 0 THEN NULL ELSE (10000 * n_pos) div n END")
          .cast("long").as("p_at_all_bp"))
  }

  /** Cohen's κ inter-annotator agreement (Cohen 1960) over two
    * categorical rating columns — the label-quality audit a supervised
    * curation pipeline runs before trusting its raters (human or model):
    * raw agreement corrected for the agreement two INDEPENDENT raters
    * with these marginal distributions would reach by chance.
    *
    * Exact basis points: po_bp = (10000·n_agree) div n; pe_bp =
    * (10000·Σ_c nA_c·nB_c) div n² — the marginal products accumulate in
    * DECIMAL(38,0) so a 10¹²-row corpus can't overflow the n² term — and
    * kappa_bp = ((po_bp − pe_bp)·10000) div (10000 − pe_bp), the
    * fixed-point (po − pe)/(1 − pe). κ is UNDEFINED when pe = 1 (both
    * raters constant and equal) → NULL. Spark's `div` truncates toward
    * zero; κ < 0 (worse-than-chance) is legal, so an oracle must replay
    * the truncation with a sign case (the q110 recipe).
    *
    * Scale shape: one agree/count scan plus two category-sized marginal
    * censuses joined on category — all three aggregations map-side-
    * combinable; nothing data-sized ever joins or broadcasts.
    * Output: one row (n, n_agree, po_bp, pe_bp, kappa_bp).
    */
  def cohenKappa(df: DataFrame, raterA: String, raterB: String): DataFrame = {
    val base = df.filter(col(raterA).isNotNull && col(raterB).isNotNull)
    val tot = base.agg(
      count(lit(1)).as("n"),
      sum(when(col(raterA) === col(raterB), 1L).otherwise(0L)).as("n_agree"))
    val ma = base.groupBy(col(raterA).as("cat")).agg(count(lit(1)).as("na"))
    val mb = base.groupBy(col(raterB).as("cat")).agg(count(lit(1)).as("nb"))
    val pe = ma.join(mb, "cat")
      .agg(coalesce(
        sum(col("na").cast("decimal(38,0)") * col("nb").cast("decimal(38,0)")),
        lit(0).cast("decimal(38,0)")).as("pp"))
    tot.crossJoin(pe)
      .withColumn("po_bp", expr("(10000 * n_agree) div n"))
      .withColumn(
        "pe_bp",
        expr("CAST((CAST(10000 AS DECIMAL(38,0)) * pp) div " +
          "(CAST(n AS DECIMAL(38,0)) * CAST(n AS DECIMAL(38,0))) AS BIGINT)"))
      .withColumn(
        "kappa_bp",
        when(col("pe_bp") === 10000L, lit(null).cast("long"))
          .otherwise(expr("((po_bp - pe_bp) * 10000) div (10000 - pe_bp)")))
      .select("n", "n_agree", "po_bp", "pe_bp", "kappa_bp")
  }
}
