package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Priority sampling (Duffield–Lund–Thorup 2007): the weighted, mergeable
  * bounded sample with an unbiased subset-sum estimator — the missing
  * member of the repo's sampling tier between the uniform bottom-k sketch
  * ([[QuantileSketch]]) and exact PPS systematic draws
  * ([[Sampling.ppsSystematic]], which needs a global prefix pass and is
  * neither bounded-state nor mergeable).
  *
  * Each row gets priority q = w/u with u ∈ (0,1] a uniform hash of its id
  * (md5 first 8 hex — the q46 split convention, ingest-stable and
  * SQL-replayable); the sketch keeps the k+1 highest-priority rows per
  * group. The top k are the sample; the (k+1)-th priority is the
  * threshold τ, and ŵ = max(w, τ) per sampled row makes Σŵ an unbiased
  * estimator of ANY subset's total weight — the property plain weighted
  * top-k lacks. Keeping k+1 rows preserves the min-k merge identity, so
  * partial sketches fold associatively across partitions, snapshots, or
  * stream batches.
  *
  * Exactness: priorities stay rationals w·2³²/(h+1). Ordering uses
  * ⌊w·2⁶⁴/(h+1)⌋ in DECIMAL(38,0) (positive-mod floor division, the
  * [[TheilSen]] discipline) — collision-free for DISTINCT priorities
  * because two of them differ by ≥ 2⁻³² and the key scales by 2³² beyond
  * the 2³² priority grid; equal priorities tie-break by id. Weights are
  * per-row asserted into [1, 10⁹] so every product fits DECIMAL(38,0).
  * Estimates ship as canonical digit-string ppm (τ = w·2³²·10⁶/(h+1) can
  * reach ~4·10²⁴ when a tiny hash lands on a heavy row — beyond BIGINT —
  * and a DECIMAL-typed output column hash-mismatches cross-engine
  * comparison even on identical values; the string renders digit-exact
  * everywhere).
  *
  * Scale shape: the sketch is one [[TopK.perGroup]] pass (two-phase,
  * hash-sharded); estimates touch only the (k+1)-bounded relation.
  */
object PrioritySample {

  private val dec = "decimal(38,0)"
  private val twoTo32 = "4294967296"
  private val twoTo64 = "18446744073709551616"

  private def withPriorityKey(base: DataFrame): DataFrame =
    base
      .withColumn("h",
        expr("CAST(conv(substring(md5(CAST(id AS STRING)), 1, 8), 16, 10) AS BIGINT)"))
      .withColumn("__a", expr(s"cast(w as $dec) * $twoTo64"))
      .withColumn("__key",
        expr(s"(__a - pmod(__a, cast(h + 1 as $dec))) / cast(h + 1 as $dec)"))

  /** The k+1 highest-priority rows per group: (groupCols…, id, w, h). */
  def sketch(
      df: DataFrame,
      groupCols: Seq[String],
      idCol: String,
      wCol: String,
      k: Int): DataFrame = {
    require(k >= 1, s"sample size k must be >= 1: $k")
    val base = df.select(
      groupCols.map(col) ++ Seq(
        col(idCol).cast("string").as("id"),
        col(wCol).cast("long").as("w")): _*)
      .filter(assert_true(
        col("w") >= 1L && col("w") <= 1000000000L,
        concat(lit("PrioritySample: weight contract (1 <= w <= 1e9) violated: "),
          col("w").cast("string"))).isNull)
    TopK.perGroup(
      withPriorityKey(base), groupCols,
      Seq(col("__key").desc, col("id").asc), k + 1)
      .select(groupCols.map(col) ++ Seq(col("id"), col("w"), col("h")): _*)
  }

  /** Merge sketches over DISJOINT row sets (min-k identity on the
    * priority order, carried at k+1 rows).
    */
  def merge(a: DataFrame, b: DataFrame, groupCols: Seq[String], k: Int): DataFrame =
    TopK.perGroup(
      withPriorityKey(a.unionByName(b)), groupCols,
      Seq(col("__key").desc, col("id").asc), k + 1)
      .select(groupCols.map(col) ++ Seq(col("id"), col("w"), col("h")): _*)

  /** The sample with subset-sum estimates: the sketch's top k rows plus
    * est_ppm = max(w, τ)·10⁶ as a canonical digit string (exact decimal
    * internally), τ = the (k+1)-th priority
    * (groups that fit entirely in k rows have no τ — their estimates are
    * the exact weights). Output: (groupCols…, id, w, est_ppm).
    */
  def estimates(sketch: DataFrame, groupCols: Seq[String], k: Int): DataFrame = {
    val ranked = TopK.perGroup(
      withPriorityKey(sketch), groupCols,
      Seq(col("__key").desc, col("id").asc), k + 1)
    // a literal join key folds the ungrouped case into the same left join
    // (τ absent when the whole group fits in k rows)
    val jk = groupCols :+ "__j"
    val sample = ranked.filter(col("rk") <= k).withColumn("__j", lit(1))
    val tau = ranked.filter(col("rk") === k + 1)
      .select(groupCols.map(col) ++ Seq(
        lit(1).as("__j"), col("w").as("__wt"), col("h").as("__ht")): _*)
    sample.join(broadcast(tau), jk, "left").select(
      groupCols.map(col) ++ Seq(
        col("id"), col("w"),
        expr(s"""CASE
                 WHEN __wt IS NULL THEN cast(w as $dec) * 1000000
                 WHEN cast(w as $dec) * (cast(__ht as $dec) + 1)
                      >= cast(__wt as $dec) * $twoTo32
                   THEN cast(w as $dec) * 1000000
                 ELSE (cast(__wt as $dec) * $twoTo32 * 1000000
                       - pmod(cast(__wt as $dec) * $twoTo32 * 1000000,
                              cast(__ht as $dec) + 1))
                      / (cast(__ht as $dec) + 1)
                 END""").cast(dec).cast("string").as("est_ppm")): _*)
  }
}
