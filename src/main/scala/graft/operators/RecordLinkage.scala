package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Probabilistic record linkage — the Fellegi–Sunter model (JASA 1969;
  * Newcombe 1959) in EXACT INTEGERS: score candidate pairs by how much
  * more likely their per-attribute agreement pattern is under "same
  * entity" than under "random pair", with both probabilities estimated
  * from the data itself as integer ratios.
  *
  *   - u_a (chance agreement) = Σ_v f_v² / n² over source A's value
  *     frequencies for attribute a — the exact probability two random
  *     A-records agree on a (NULL is a value). Distinctive attributes
  *     (name) get tiny u and thus large agreement reward; common ones
  *     (segment) get u ≈ 1/#values and reward little — the Newcombe
  *     insight, derived from data, not hand weights.
  *   - m_a (agreement among true matches) = (agree + 1)/(|L| + 2) over a
  *     labeled match-pair sample L, Laplace-smoothed so a perfectly
  *     clean or perfectly dirty sample never yields a 0 or 1 that would
  *     zero a likelihood product.
  *
  * The classical score is Σ log(m/u) — floats. This operator never
  * leaves ℚ: each attribute contributes the fraction m/u (agreement) or
  * (1−m)/(1−u) (disagreement), each fraction is gcd-REDUCED (the
  * weights relation is ≤ #attrs rows — a bounded driver value), and a
  * pair's score is the literal product Π num / Π den carried internally
  * in DECIMAL(38,0) and shipped as two canonical digit-string columns.
  * Ordering equals the log-sum ordering exactly,
  * the decision `num ≥ θ·den` is integer, and the whole computation
  * replays bit-for-bit in any engine with 128-bit integers.
  *
  * Scale shape: u needs one groupBy per attribute over source A (attrs
  * are few); m one join over the labeled sample; scoring is a
  * scan-level projection over the candidate pairs with the weights
  * embedded as literals — no shuffle beyond fetching the two sides.
  * Candidates come from any blocker ([[BlockDedup]], [[Dedup]] LSH,
  * [[SimilarityJoin]]); this operator is the verify/decide stage.
  */
object RecordLinkage {

  /** Reduced per-attribute likelihood factors. */
  final case class AttrWeight(
      attr: String, agreeNum: Long, agreeDen: Long, disNum: Long, disDen: Long)

  /** Chance-agreement counts per attribute over `df`:
    * (attr, u_num = Σ f_v², u_den = n²), NULL as a value. n² must fit a
    * long (n < 3·10⁹); beyond that, estimate u on a deterministic
    * md5 stratum via [[fsWeightsSampled]] — u is a population ratio, and
    * a bounded stratum estimates it without materializing n².
    */
  def uCounts(df: DataFrame, attrs: Seq[String]): DataFrame = {
    require(attrs.nonEmpty, "uCounts needs attributes")
    attrs.map { a =>
      df.groupBy(col(a)).agg(count(lit(1)).as("__f"))
        .agg(sum(col("__f") * col("__f")).as("u_num"), sum("__f").as("__n"))
        .select(
          lit(a).as("attr"),
          col("u_num").cast("long"),
          (col("__n") * col("__n")).cast("long").as("u_den"))
    }.reduce(_ unionByName _)
  }

  /** Matched-pair agreement counts per attribute:
    * (attr, m_num = agree + 1, m_den = |labeled| + 2), null-safe equality.
    */
  def mCounts(
      a: DataFrame,
      b: DataFrame,
      idA: String,
      idB: String,
      labeled: DataFrame,
      attrs: Seq[String]): DataFrame = {
    require(attrs.nonEmpty, "mCounts needs attributes")
    val ax = a.select(col(idA).as("x_id"), struct(attrs.map(col): _*).as("__ax"))
    val bx = b.select(col(idB).as("y_id"), struct(attrs.map(col): _*).as("__bx"))
    val j = labeled.select(col("x_id"), col("y_id"))
      .join(ax, "x_id").join(bx, "y_id")
    val aggs = count(lit(1)).as("__n") +: attrs.map(at =>
      sum(when(col(s"__ax.$at") <=> col(s"__bx.$at"), 1L).otherwise(0L)).as(s"__a_$at"))
    val row = j.agg(aggs.head, aggs.tail: _*)
    attrs.map { at =>
      row.select(
        lit(at).as("attr"),
        (col(s"__a_$at") + 1L).as("m_num"),
        (col("__n") + 2L).as("m_den"))
    }.reduce(_ unionByName _)
  }

  private def gcd(a: Long, b: Long): Long = if (b == 0L) a else gcd(b, a % b)

  // agree: (mn/md) / (un/ud);  disagree: ((md−mn)/md) / ((ud−un)/ud).
  // Each fraction gcd-reduces, then QUANTIZES to num,den ≤ 10^6 by a
  // shared ceil-scale floor division (min 1): the product of k
  // factors stays ≤ 10^{6k} — inside DECIMAL(38,0) for k ≤ 6 — at a
  // ≤ 10⁻⁶ relative error per log-weight, far below the sampling
  // error of m and u themselves. Deterministic integer math, so the
  // oracle replays the same quantized weights bit-for-bit.
  private def reduced(at: String)(n0: BigInt, d0: BigInt): (Long, Long) = {
    require(d0 > 0 && n0 > 0, s"degenerate factor for $at: $n0/$d0")
    val g = n0.gcd(d0)
    val (n1, d1) = (n0 / g, d0 / g)
    val cap = BigInt(1000000L)
    val hi = n1.max(d1)
    if (hi <= cap) (n1.toLong, d1.toLong)
    else {
      val s = (hi + cap - 1) / cap
      ((n1 / s).max(1).toLong, (d1 / s).max(1).toLong)
    }
  }

  private def weightsFromCounts(
      u: Map[String, (BigInt, BigInt)],
      m: Map[String, (BigInt, BigInt)],
      attrs: Seq[String]): Seq[AttrWeight] =
    attrs.map { at =>
      val (un0, ud0) = u(at)
      val (mn, md) = m(at)
      val gu = un0.gcd(ud0)
      val (un, ud) = (un0 / gu, ud0 / gu)
      val (an, ad) = reduced(at)(mn * ud, md * un)
      val (dn, dd) = reduced(at)((md - mn) * ud, md * (ud - un))
      AttrWeight(at, an, ad, dn, dd)
    }

  /** Estimate and reduce the per-attribute factors (bounded collect:
    * ≤ #attrs rows per relation).
    */
  def fsWeights(
      a: DataFrame,
      b: DataFrame,
      idA: String,
      idB: String,
      labeled: DataFrame,
      attrs: Seq[String]): Seq[AttrWeight] = {
    val u = uCounts(a, attrs).collect()
      .map(r => r.getString(0) -> (BigInt(r.getLong(1)), BigInt(r.getLong(2)))).toMap
    val m = mCounts(a, b, idA, idB, labeled, attrs).collect()
      .map(r => r.getString(0) -> (BigInt(r.getLong(1)), BigInt(r.getLong(2)))).toMap
    weightsFromCounts(u, m, attrs)
  }

  /** [[fsWeights]] with u estimated on a deterministic md5 STRATUM of
    * source A — the scale seam [[uCounts]]' scaladoc prescribes: n² must
    * fit a long (n < 3·10⁹), so beyond that the chance-agreement ratio is
    * estimated on `stratumBp` basis points of A selected by
    * [[Sampling.hashUniform]] over the id (pure projection, no RNG,
    * stable under retries/ingest). m still uses the FULL labeled sample —
    * labels are scarce, never subsample them.
    *
    * Estimator: the population ratio u = (Σf(f−1) + n)/n² splits into the
    * DISTINCT-pair agreement rate Σf(f−1)/(n(n−1)) — for which the
    * stratum's own distinct-pair rate Σf_s(f_s−1)/(n_s(n_s−1)) is the
    * unbiased estimator (two distinct stratum records ARE two distinct
    * population records) — plus the exact self-pair term n/n², with n one
    * cheap count. So near-unique attributes (f ≡ 1, the naive Σf_s²/n_s²
    * stratum estimate's failure mode — it overstates u by 1/fraction)
    * come out EXACT at u = 1/n, and categorical attributes are unbiased
    * with stratum-sized sampling noise. All arithmetic is integer
    * (BigInt on ≤ #attrs driver-side scalars), then the same gcd-reduce +
    * ≤10⁶ quantization as [[fsWeights]].
    */
  def fsWeightsSampled(
      a: DataFrame,
      b: DataFrame,
      idA: String,
      idB: String,
      labeled: DataFrame,
      attrs: Seq[String],
      stratumBp: Long): Seq[AttrWeight] = {
    require(
      stratumBp >= 1 && stratumBp <= 10000,
      s"stratumBp must be in [1, 10000]: $stratumBp")
    val m = mCounts(a, b, idA, idB, labeled, attrs).collect()
      .map(r => r.getString(0) -> (BigInt(r.getLong(1)), BigInt(r.getLong(2)))).toMap
    if (stratumBp == 10000L) {
      val u = uCounts(a, attrs).collect()
        .map(r => r.getString(0) -> (BigInt(r.getLong(1)), BigInt(r.getLong(2)))).toMap
      weightsFromCounts(u, m, attrs)
    } else {
      val frac = (BigDecimal(stratumBp) / BigDecimal(10000)).toDouble
      val stratum = a.filter(Sampling.hashUniform(col(idA)) < lit(frac))
      val n = BigInt(a.count())
      require(n >= 2, s"fsWeightsSampled needs >= 2 rows: $n")
      // per attr over the stratum: Σ f_s(f_s−1) (ordered agreeing distinct
      // pairs) and n_s — one groupBy per attr, same shape as uCounts
      val u = attrs.map { at =>
        val r = stratum.groupBy(col(at)).agg(count(lit(1)).as("__f"))
          .agg(
            sum(col("__f") * (col("__f") - 1L)).as("c2"),
            sum("__f").as("ns"))
          .head()
        require(!r.isNullAt(1) && r.getLong(1) >= 2,
          s"stratum too small for '$at': need >= 2 rows, got ${if (r.isNullAt(1)) 0 else r.getLong(1)}")
        val c2 = BigInt(r.getLong(0))
        val ns = BigInt(r.getLong(1))
        val uNum = c2 * n * (n - 1) + n * ns * (ns - 1)
        val uDen = n * n * ns * (ns - 1)
        at -> (uNum, uDen)
      }.toMap
      weightsFromCounts(u, m, attrs)
    }
  }

  /** Unsupervised m/u estimation via EM over the agreement-pattern
    * histogram (Winkler 1988's three-class reduction of Fellegi–Sunter to
    * two classes; Dempster–Laird–Rubin 1977) — the path real MDM takes
    * when NO labeled match sample exists. The candidate pairs (from any
    * blocker) reduce to a histogram of ≤ 2^#attrs agreement patterns —
    * one groupBy, a driver-bounded collect — and a FIXED number of EM
    * iterations fits (p, m_a, u_a) on the driver.
    *
    * The whole iteration runs in FIXED-POINT INTEGERS at scale Q = 10⁶
    * (the engine's "never leaves ℚ" discipline): every rate lives in
    * [1, Q−1], the E-step posterior is w = ⌊pm·Q / (pm+pu)⌋ with pm/pu
    * exact integer likelihood products, and the M-step re-estimates by
    * floor division — so the fit is bit-deterministic, engine-portable,
    * and a DuckDB oracle replays it exactly with HUGEINT (products reach
    * Q^(#attrs+1)·Q ≤ 10³⁶ for 4 attrs — inside int128; the Scala side
    * uses BigInt and allows up to 16 attrs). The ⌊·⌋ quantization noise
    * per step is ≤ 10⁻⁶ — far below EM's own statistical error, and the
    * final weights quantize to ≤ 10⁶ rationals anyway.
    *
    * The fitted m/u reduce to the same rational factors [[fsWeights]]
    * produces (agree = m/u, disagree = (Q−m)/(Q−u)), so [[scorePairs]]
    * consumes either interchangeably — but EM's u is "agreement among
    * candidate NON-matches", not the labeled path's "agreement among
    * random pairs", so scores live on a different scale: calibrate θ per
    * weight source (rankings transfer; thresholds do not). Init (m=0.9,
    * u=0.1, p=0.1) is Winkler's standard start; the m>u orientation is
    * asserted post-fit — if EM label-switches on a degenerate corpus it
    * fails loudly rather than silently inverting every decision.
    */
  def fsWeightsEm(
      a: DataFrame,
      b: DataFrame,
      idA: String,
      idB: String,
      candidates: DataFrame,
      attrs: Seq[String],
      iters: Int = 30): Seq[AttrWeight] = {
    require(attrs.nonEmpty && attrs.size <= 16, s"attrs must be 1..16: ${attrs.size}")
    require(iters >= 1, s"iters must be >= 1: $iters")
    val ax = a.select(col(idA).as("x_id"), struct(attrs.map(col): _*).as("__ax"))
    val bx = b.select(col(idB).as("y_id"), struct(attrs.map(col): _*).as("__bx"))
    val gCols = attrs.map(at => (col(s"__ax.$at") <=> col(s"__bx.$at")).as(s"__g_$at"))
    val hist = candidates.select(col("x_id"), col("y_id"))
      .join(ax, "x_id").join(bx, "y_id")
      .select(gCols: _*)
      .groupBy(attrs.map(at => col(s"__g_$at")): _*)
      .agg(count(lit(1)).as("__c"))
      .collect()
    val k = attrs.size
    val pats = hist
      .map(r => (Array.tabulate(k)(r.getBoolean), r.getLong(k)))
      .sortBy(_._1.map(g => if (g) '1' else '0').mkString)
    require(pats.nonEmpty, "fsWeightsEm: no candidate pairs")
    val n = BigInt(pats.map(_._2).sum)
    val Q = 1000000L
    def clampQ(x: BigInt): Long = x.max(1).min(Q - 1).toLong
    var p = 100000L
    val m = Array.fill(k)(900000L)
    val u = Array.fill(k)(100000L)
    for (_ <- 0 until iters) {
      var pSum = BigInt(0)
      val mNum = Array.fill(k)(BigInt(0))
      val uNum = Array.fill(k)(BigInt(0))
      var mDen = BigInt(0)
      var uDen = BigInt(0)
      pats.foreach { case (g, c) =>
        var pm = BigInt(p)
        var pu = BigInt(Q - p)
        var i = 0
        while (i < k) {
          pm *= (if (g(i)) m(i) else Q - m(i))
          pu *= (if (g(i)) u(i) else Q - u(i))
          i += 1
        }
        val w = pm * Q / (pm + pu) // E-step posterior, Q-scaled floor
        pSum += c * w
        mDen += c * w
        uDen += c * (Q - w)
        i = 0
        while (i < k) {
          if (g(i)) { mNum(i) += c * w; uNum(i) += c * (Q - w) }
          i += 1
        }
      }
      p = clampQ(pSum / n)
      for (i <- 0 until k) {
        m(i) = clampQ(mNum(i) * Q / mDen.max(1))
        u(i) = clampQ(uNum(i) * Q / uDen.max(1))
      }
    }
    attrs.indices.foreach { i =>
      require(
        m(i) > u(i),
        s"fsWeightsEm label-switched on '${attrs(i)}': m=${m(i)} <= u=${u(i)} — " +
          "the candidate set does not separate matches from non-matches")
    }
    attrs.indices.map { i =>
      val (an, ad) = reduced(attrs(i))(BigInt(m(i)), BigInt(u(i)))
      val (dn, dd) = reduced(attrs(i))(BigInt(Q - m(i)), BigInt(Q - u(i)))
      AttrWeight(attrs(i), an, ad, dn, dd)
    }
  }

  /** Score candidate pairs under reduced weights: output
    * (x_id, y_id, attrs-agreement booleans…, score_num, score_den,
    * is_match) with score carried as the exact numerator / denominator
    * rendered as canonical digit STRINGS (the DECIMAL(38,0) rationals
    * genuinely exceed BIGINT — up to 10³⁷ under the overflow guard — and
    * a DECIMAL-typed output column hash-mismatches cross-engine
    * comparison even on identical values) and is_match = score ≥ θ
    * (θ = thetaNum/thetaDen) decided in exact decimal arithmetic.
    */
  def scorePairs(
      a: DataFrame,
      b: DataFrame,
      idA: String,
      idB: String,
      attrs: Seq[String],
      candidates: DataFrame,
      weights: Seq[AttrWeight],
      thetaNum: Long,
      thetaDen: Long = 1L): DataFrame = {
    require(weights.map(_.attr) == attrs, "weights must align with attrs")
    require(thetaNum >= 0 && thetaDen >= 1, s"bad threshold $thetaNum/$thetaDen")
    val maxProd = weights.map(w => BigInt(math.max(math.max(w.agreeNum, w.agreeDen),
      math.max(w.disNum, w.disDen)))).product * BigInt(math.max(thetaNum, thetaDen))
    require(
      maxProd < BigInt(10).pow(37),
      s"factor product can overflow DECIMAL(38,0): $maxProd — rescale weights")
    val ax = a.select(col(idA).as("x_id"), struct(attrs.map(col): _*).as("__ax"))
    val bx = b.select(col(idB).as("y_id"), struct(attrs.map(col): _*).as("__bx"))
    val j = candidates.select(col("x_id"), col("y_id"))
      .join(ax, "x_id").join(bx, "y_id")
    val agreeCols = attrs.map(at => (col(s"__ax.$at") <=> col(s"__bx.$at")).as(s"agree_$at"))
    val one = lit(1L).cast("decimal(38,0)")
    val num = weights.foldLeft(one) { (acc, w) =>
      acc * when(col(s"agree_${w.attr}"), lit(w.agreeNum)).otherwise(lit(w.disNum))
    }
    val den = weights.foldLeft(one) { (acc, w) =>
      acc * when(col(s"agree_${w.attr}"), lit(w.agreeDen)).otherwise(lit(w.disDen))
    }
    // decimals never leave the operator: the exact rationals ship as
    // canonical digit strings (DECIMAL-typed outputs render
    // side-dependently under cross-engine hash comparison)
    j.select((col("x_id") +: col("y_id") +: agreeCols): _*)
      .withColumn("score_num", num.cast("decimal(38,0)").cast("string"))
      .withColumn("score_den", den.cast("decimal(38,0)").cast("string"))
      .withColumn(
        "is_match",
        num.cast("decimal(38,0)") * lit(thetaDen) >=
          den.cast("decimal(38,0)") * lit(thetaNum))
  }
}
