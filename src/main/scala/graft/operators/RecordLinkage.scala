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
  * pair's score is the literal product Π num / Π den carried as two
  * DECIMAL(38,0) columns. Ordering equals the log-sum ordering exactly,
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
    * stratum — u is a population ratio, and a fixed-size stratum
    * ([[Sampling.hashSplit]]) estimates it without scanning the corpus.
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
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val m = mCounts(a, b, idA, idB, labeled, attrs).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    attrs.map { at =>
      val (un0, ud0) = u(at)
      val (mn, md) = m(at)
      val gu = gcd(un0, ud0)
      val (un, ud) = (un0 / gu, ud0 / gu)
      // agree: (mn/md) / (un/ud);  disagree: ((md−mn)/md) / ((ud−un)/ud).
      // Each fraction gcd-reduces, then QUANTIZES to num,den ≤ 10^6 by a
      // shared ceil-scale floor division (min 1): the product of k
      // factors stays ≤ 10^{6k} — inside DECIMAL(38,0) for k ≤ 6 — at a
      // ≤ 10⁻⁶ relative error per log-weight, far below the sampling
      // error of m and u themselves. Deterministic integer math, so the
      // oracle replays the same quantized weights bit-for-bit.
      def reduced(n: Long, d: Long): (Long, Long) = {
        require(d > 0 && n > 0, s"degenerate factor for $at: $n/$d")
        val g = gcd(n, d)
        val (n1, d1) = (n / g, d / g)
        val cap = 1000000L
        val hi = math.max(n1, d1)
        if (hi <= cap) (n1, d1)
        else {
          val s = (hi + cap - 1) / cap
          (math.max(1L, n1 / s), math.max(1L, d1 / s))
        }
      }
      val (an, ad) = reduced(mn * ud, md * un)
      val (dn, dd) = reduced((md - mn) * ud, md * (ud - un))
      AttrWeight(at, an, ad, dn, dd)
    }
  }

  /** Score candidate pairs under reduced weights: output
    * (x_id, y_id, attrs-agreement booleans…, score_num, score_den,
    * is_match) with score carried as exact DECIMAL(38,0) numerator /
    * denominator and is_match = score ≥ θ (θ = thetaNum/thetaDen).
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
    j.select((col("x_id") +: col("y_id") +: agreeCols): _*)
      .withColumn("score_num", num.cast("decimal(38,0)"))
      .withColumn("score_den", den.cast("decimal(38,0)"))
      .withColumn(
        "is_match",
        col("score_num") * lit(thetaDen) >= col("score_den") * lit(thetaNum))
  }
}
