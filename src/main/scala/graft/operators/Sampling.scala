package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling and split operators for training-data curation —
  * the pipeline steps every corpus-scale run needs between dedup and
  * training: reproducible train/validation splits and per-stratum quota
  * caps (per-language, per-source, per-domain).
  *
  * All selection is keyed on MD5 of the record id — not a seeded RNG — so:
  *   - assignment is a pure projection (no shuffle, no state, no RNG
  *     sequence coupling to partitioning — `rand()` changes under retry or
  *     repartition; a hash never does);
  *   - re-runs, retried tasks, and other engines agree bit-for-bit (MD5 is
  *     engine-portable, which is what makes these operators exactly
  *     SQL-oracle-able rather than distribution-tested);
  *   - the split of one record never depends on the rest of the corpus, so
  *     incremental ingest keeps historical assignments stable.
  *
  * Scale: [[hashSplit]] is a scan-level projection. [[stratifiedCap]]
  * rides the two-phase [[TopK.perGroup]] so a mega-stratum never funnels
  * into one task.
  */
object Sampling {

  /** Uniform-in-[0,1) from the first 8 hex chars of md5(id) — the
    * deterministic replacement for `rand(seed)`.
    */
  def hashUniform(id: Column): Column =
    conv(substring(md5(id.cast("string")), 1, 8), 16, 10).cast("double") /
      lit(4294967296.0)

  /** Assign every row to a named split with the given fractions (must sum
    * to ≤ 1; a remainder falls into the LAST split). Fractions are hit
    * exactly in expectation; assignment is per-row deterministic.
    * Output: input columns + `split`.
    */
  def hashSplit(df: DataFrame, idCol: String, splits: Seq[(String, Double)]): DataFrame = {
    require(splits.nonEmpty, "at least one split")
    require(splits.map(_._2).sum <= 1.0 + 1e-9, s"fractions sum over 1: $splits")
    val u = hashUniform(col(idCol))
    // decimal-exact cumulative bounds: float accumulation would give
    // 0.8+0.1 = 0.9000000000000001, a DIFFERENT double than the 0.9 an
    // oracle (or a config file) writes down
    val cums = splits
      .scanLeft(BigDecimal(0))((acc, s) => acc + BigDecimal(s._2.toString))
      .tail.map(_.toDouble)
    val expr = splits.zip(cums).init.foldRight(lit(splits.last._1): Column) {
      case (((name, _), cum), rest) => when(u < cum, name).otherwise(rest)
    }
    df.withColumn("split", expr)
  }

  /** Per-stratum weighted downsampling — the DOMAIN-MIXING step of a
    * training-data pipeline (Pile/DoReMi-style source reweighting): keep
    * each row with its stratum's rate, deterministically. A row survives
    * iff hashUniform(id) < rate(stratum), so the operator is a pure
    * scan-level filter: no shuffle, no RNG, stable under retries and
    * incremental ingest, and a given document's fate never changes when
    * OTHER sources' rates are retuned (resampling one domain does not
    * churn the rest of the corpus — the property a seeded `rand()` pass
    * does not have). Rates must be exactly-representable decimals written
    * the way the oracle writes them (0.75, not 3.0/4) so the `<` compare
    * is bit-identical cross-engine.
    */
  def weightedSample(
      df: DataFrame,
      idCol: String,
      strataCol: String,
      rates: Seq[(String, Double)],
      defaultRate: Double): DataFrame = {
    require((defaultRate +: rates.map(_._2)).forall(r => r >= 0 && r <= 1),
      s"rates must be in [0,1]: $rates default=$defaultRate")
    val u = hashUniform(col(idCol))
    val rate = rates.foldRight(lit(defaultRate): Column) {
      case ((name, r), els) => when(col(strataCol) === name, lit(r)).otherwise(els)
    }
    df.filter(u < rate)
  }

  /** Keep at most `n` rows per stratum, chosen by MD5 order of the id (a
    * deterministic "random" cap). Two-phase per-group top-k underneath —
    * no stratum ever sorts in a single task. Output: input columns.
    */
  def stratifiedCap(df: DataFrame, strataCol: String, idCol: String, n: Int): DataFrame = {
    val cols = df.columns
    TopK
      .perGroup(
        df.withColumn("_h", md5(col(idCol).cast("string"))),
        Seq(strataCol),
        Seq(col("_h").asc, col(idCol).asc),
        n,
        rankCol = "_rk")
      .select(cols.head, cols.tail: _*)
  }

  /** Exact integer square root as a column expression: floor(√x) with a
    * ±1 correction after the IEEE sqrt, so the result is the true isqrt
    * even if the correctly-rounded double sqrt lands on the wrong side of
    * an integer boundary — engine-portable without trusting float→floor.
    */
  def isqrt(x: Column): Column = {
    val s0 = floor(sqrt(x.cast("double"))).cast("long")
    val down = s0 - when(s0 * s0 > x, 1L).otherwise(0L)
    // up-correct via x − down² > 2·down ⟺ (down+1)² ≤ x, written so the
    // largest intermediate is x itself (no overflow at Long.MaxValue)
    down + when(x - down * down > down * 2L, 1L).otherwise(0L)
  }

  /** Temperature-based mixture plan (α = 1/2): the multilingual/
    * multi-source REBALANCING step (XLM-R / CCNet α-sampling, mBERT
    * exponent smoothing) — big strata are downweighted toward
    * p_s ∝ n_s^α so the head language/domain stops drowning the tail.
    *
    * α = 1/2 is computed as an EXACT integer sqrt ([[isqrt]]), so
    * weights and quotas are bit-identical in any engine: weight_s =
    * isqrt(n_s), quota_s = ⌊totalN·weight_s / Σweights⌋ (floor — the
    * plan under-fills by < #strata rows rather than oversubscribing).
    * A quota is also capped at n_s: √-weighting hands small strata a
    * share they may not be able to fill.
    *
    * Scale: one map-side-combined count by stratum → a #strata-row
    * relation; everything after is arithmetic on that bounded relation.
    * Output: (stratum, n_in, weight, quota) — stratum keeps `strataCol`'s
    * name.
    */
  def mixturePlan(df: DataFrame, strataCol: String, totalN: Long): DataFrame = {
    require(totalN > 0, s"totalN must be > 0: $totalN")
    val counts = df.groupBy(col(strataCol)).agg(count(lit(1)).as("n_in"))
    val weighted = counts.withColumn("weight", isqrt(col("n_in")))
    val tot = weighted.agg(sum("weight").as("wsum"))
    weighted
      .crossJoin(broadcast(tot))
      .withColumn("quota",
        least(expr(s"($totalN * weight) div wsum"), col("n_in")))
      .select(col(strataCol), col("n_in"), col("weight"), col("quota"))
  }

  /** Materialize a [[mixturePlan]]: keep the first `quota_s` rows of each
    * stratum in MD5 order of the id. Selection rides the two-phase
    * [[TopK.perGroup]] (capped at the largest quota — a #strata-bounded
    * driver value, the collect→broadcast dimension idiom), then trims
    * each stratum to its own quota; no stratum ever sorts in one task and
    * a document's fate is independent of other strata's sizes beyond the
    * quota arithmetic. Output: input columns.
    */
  def temperatureSample(
      df: DataFrame,
      strataCol: String,
      idCol: String,
      totalN: Long): DataFrame = {
    val cols = df.columns
    val plan = mixturePlan(df, strataCol, totalN)
    val maxQuota = plan.agg(max("quota")).head().getLong(0)
    TopK
      .perGroup(
        df.withColumn("_h", md5(col(idCol).cast("string"))),
        Seq(strataCol),
        Seq(col("_h").asc, col(idCol).asc),
        math.max(maxQuota, 1L).toInt,
        rankCol = "_rk")
      .join(broadcast(plan.select(col(strataCol), col("quota"))), strataCol)
      .filter(col("_rk") <= col("quota"))
      .select(cols.head, cols.tail: _*)
  }

  /** Leakage-safe train/val/test split: assign every row the split of
    * its DUPLICATE CLUSTER, not of itself — the eval-hygiene step a
    * per-document [[hashSplit]] cannot provide: two near-duplicate
    * documents split independently land one in train and one in test
    * with probability 2·p·(1−p), and the eval set silently contains
    * training data (the contamination Lee et al. 2022 measure). Keying
    * the split on the cluster representative makes co-membership a
    * THEOREM: equal rep ⇒ equal split, whatever the fractions.
    *
    * `clusters` maps `clusterIdCol` → `repCol` (e.g.
    * [[Dedup.minhashDedup]]'s (sid, rep)); rows absent from the map
    * split as their own singleton cluster. One broadcast-or-shuffle
    * left join + a scan-level projection — no new shuffle beyond the
    * cluster map itself. Output: df columns + (repCol, split).
    */
  def leakageSafeSplit(
      df: DataFrame,
      idCol: String,
      clusters: DataFrame,
      clusterIdCol: String,
      repCol: String,
      splits: Seq[(String, Double)]): DataFrame = {
    val joined = df
      .join(
        clusters.select(col(clusterIdCol).as(idCol), col(repCol)),
        Seq(idCol),
        "left")
      .withColumn(repCol, coalesce(col(repCol), col(idCol)))
    hashSplit(joined, repCol, splits)
  }

  /** PPS systematic sampling (Madow 1949; the survey-sampling classic,
    * and the shape a token-budget corpus selection takes at scale):
    * draw k of n with inclusion probability EXACTLY proportional to an
    * integer weight (tokens, bytes, quality mass), in ONE pass with no
    * RNG and no global sort.
    *
    * Rows lay out on a weight line in id order — row i owns the interval
    * [c_i, c_i + w_i) where c_i is the exclusive prefix sum of weights
    * (the [[PrefixSum]] recursion; ids must be unique non-negative) —
    * and k midpoint targets t_j = (2j+1)·W/(2k) select whatever interval
    * contains them. All arithmetic stays integer by comparing
    * 2k·c against (2j+1)·W, so hits per row close-form to
    *
    *   n_hits(i) = ⌊(2k·(c_i+w_i) + W − 1) / 2W⌋ − ⌊(2k·c_i + W − 1) / 2W⌋
    *
    * which telescopes to Σ n_hits = k exactly, and per row lands in
    * {⌊k·w/W⌋, ⌈k·w/W⌉} — the textbook PPS-systematic guarantee (a row
    * with weight > W/k is drawn multiple times; n_hits is its sampling
    * multiplicity and must be kept for unbiased estimation). Both
    * invariants are spec-pinned. Zero-weight rows are never selected.
    *
    * Output: (idCol, weight, n_hits) for rows with n_hits ≥ 1.
    */
  def ppsSystematic(df: DataFrame, idCol: String, weightCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    val kv = df.select(col(idCol).cast("long").as("k"), col(weightCol).cast("long").as("s"))
    // min rides the same single-scalar action: a negative weight would make
    // the prefix-sum intervals non-monotone (negative n_hits on some rows,
    // double-counted hits on others) while the telescoping invariant still
    // appears to hold — every documented guarantee assumes w >= 0
    val bounds = kv.agg(sum("s"), min("s")).head()
    val totalW = bounds.getLong(0)
    require(
      bounds.isNullAt(1) || bounds.getLong(1) >= 0,
      s"ppsSystematic requires non-negative weights: min=${bounds.getLong(1)}")
    require(totalW >= 1, s"total weight must be >= 1: $totalW")
    require(
      totalW <= Long.MaxValue / (2L * k),
      s"2k*W overflows long: k=$k W=$totalW — widen to decimal before use")
    val before = PrefixSum.exclusive(kv)
    kv.join(before, "k")
      .select(
        col("k").as(idCol),
        col("s").as("weight"),
        (expr(s"(2*${k}L*(before+s) + ${totalW}L - 1) div ${2L * totalW}L") -
          expr(s"(2*${k}L*before + ${totalW}L - 1) div ${2L * totalW}L")).as("n_hits"))
      .filter(col("n_hits") >= 1L)
  }
}
