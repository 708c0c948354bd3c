package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Rank-biased overlap (Webber, Moffat & Zobel 2010) — the top-weighted
  * similarity of two RANKINGS of the same query set: "did the new
  * retrieval stack change what users actually see?" [[RankEval]] scores
  * one run against relevance labels; RBO compares two runs against each
  * other, weighting depth d by p^(d−1) so rank-1 swaps dominate and
  * tail churn barely registers — the A/B diff metric for ranker
  * rollouts, with p the user's patience (p = 9/10 ≈ top-10 attention).
  *
  * Extrapolated point estimate (Webber's RBO_EXT at evaluation depth k):
  *   rbo@k = (1−p)·Σ_{d=1..k} p^(d−1)·A_d + p^k·A_k,   A_d = |X_d ∩ Y_d|/d
  * — the residual mass beyond depth k is scored at the depth-k agreement,
  * so identical prefixes get exactly 1 (the truncated prefix sum alone
  * would cap at 1−p^k). The engine's DEFINED statistic floors once per
  * depth and once at the end, everything else exact integers:
  *   term_d  = (pNum^(d−1)·pDen^(k−d)·10⁶·overlap_d) div d,
  *   ext     = (pNum^k·10⁶·overlap_k) div k,
  *   rbo_ppm = ((pDen−pNum)·Σ_d term_d + ext) div pDen^k
  * (weights are DRIVER-computed BigInt literals shipped as a broadcast
  * k-row relation — no pow() in the plan). Width contract asserted by
  * name on the BINDING type, the `/ depth` division: Spark rewrites
  * DECIMAL(38,0)/INT to DECIMAL(38,6), whose integral capacity is
  * ~10³², so the contract is 10⁶·k·pDen^k < 10³² (k ≤ 24 at p = 9/10)
  * — the full-width 10³⁸ bound would admit k where term_d overflows
  * the division result despite the exact numerator fitting.
  *
  * The overlap trick that keeps this one-join: a doc ranked rx in X and
  * ry in Y is inside BOTH depth-d prefixes iff max(rx, ry) ≤ d, so
  * overlap_d = Σ_{m ≤ d} c_m over the per-query histogram of
  * m = max(rx, ry) — one equi-join on (q, d), one ≤ k-row-per-query
  * group, one broadcast depth-expansion join. Never a prefix × prefix
  * comparison.
  *
  * Ranks must be 1-based and unique per query within each run (enforced
  * upstream by construction — row_number output); docs beyond depth k
  * are ignored. Queries appearing in either run report; disjoint
  * prefixes give rbo_ppm = 0.
  *
  * Output per query: (q, n_matched, rbo_ppm), rbo_ppm ∈ [0, 10⁶].
  */
object Rbo {

  def perQuery(
      runX: DataFrame,
      runY: DataFrame,
      qCol: String,
      dCol: String,
      rankCol: String,
      k: Int,
      pNum: Long = 9L,
      pDen: Long = 10L): DataFrame = {
    require(k >= 1, s"Rbo.perQuery: k must be >= 1, got $k")
    require(pNum > 0 && pDen > 0 && pNum < pDen,
      s"Rbo.perQuery: p must be in (0,1): $pNum/$pDen")
    require(
      BigInt(1000000) * k * BigInt(pDen).pow(k) < BigInt(10).pow(32),
      s"Rbo.perQuery width contract: 1e6 * k * pDen^k must fit the " +
        s"DECIMAL(38,6) '/ depth' division result (~1e32 integral), " +
        s"got k=$k pDen=$pDen")
    val spark = runX.sparkSession
    import spark.implicits._
    def side(df: DataFrame, r: String) = df.select(
      col(qCol).as("q"), col(dCol).as("d"), col(rankCol).cast("int").as(r))
      .filter(col(r) >= 1 && col(r) <= k)
    val matched = side(runX, "rx").join(side(runY, "ry"), Seq("q", "d"))
      .select(col("q"), greatest(col("rx"), col("ry")).as("m"))
      .groupBy("q", "m").agg(count(lit(1)).as("c"))
    // driver-computed exact weights: w_d = pNum^(d-1) * pDen^(k-d)
    val weights = (1 to k).map { d =>
      (d, (BigInt(pNum).pow(d - 1) * BigInt(pDen).pow(k - d)).toString)
    }.toDF("depth", "w")
      .select(col("depth"), col("w").cast("decimal(38,0)").as("w"))
    val queries = side(runX, "rx").select("q")
      .unionByName(side(runY, "ry").select("q")).distinct()
    val denom = BigInt(pDen).pow(k).toString
    // term_d stays DECIMAL(38,0): `div` would force BIGINT and overflow at
    // w·10⁶ ≈ 10²⁵ — the pmod-subtract floor keeps the exact wide value
    // (the [[PrioritySample]] key discipline)
    val terms = matched
      .join(broadcast(weights), col("m") <= col("depth"))
      .groupBy("q", "depth", "w").agg(sum("c").as("overlap"))
      .select(col("q"),
        expr("""(w * 1000000 * overlap - pmod(w * 1000000 * overlap, depth))
               |/ depth""".stripMargin).cast("decimal(38,0)").as("term"),
        col("overlap"), col("depth"))
    val pNumK = BigInt(pNum).pow(k).toString
    val perQ = terms.groupBy("q").agg(
      sum("term").as("tsum"),
      max(when(col("depth") === k, col("overlap"))).as("n_matched"))
    queries.join(perQ, Seq("q"), "left")
      .select(
        col("q"),
        coalesce(col("n_matched"), lit(0L)).as("n_matched"),
        coalesce(
          expr(
            s"""((${pDen - pNum} * CAST(tsum AS DECIMAL(38,0)))
               | + (CAST('$pNumK' AS DECIMAL(38,0)) * 1000000 * n_matched
               |    - pmod(CAST('$pNumK' AS DECIMAL(38,0)) * 1000000 * n_matched,
               |           ${k}L))
               |   / ${k}L)
               |div CAST('$denom' AS DECIMAL(38,0))""".stripMargin),
          lit(0L)).as("rbo_ppm"))
  }
}
