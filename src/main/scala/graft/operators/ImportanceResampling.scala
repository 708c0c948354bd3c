package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** DSIR-style data selection: score every candidate document by how much
  * its hashed n-gram distribution looks like a TARGET domain rather than
  * the raw corpus, then keep the top-k — the importance-resampling step a
  * training pipeline runs to tilt a 100 TB crawl toward a quality/domain
  * target (Xie et al., "Data Selection for Language Models via Importance
  * Resampling", public method; re-derived here in exact integer
  * arithmetic so the whole pass is SQL-oracle-able).
  *
  * Deviations from the paper, chosen for engine-portability:
  *   - the per-feature weight is the SCALED INTEGER likelihood ratio
  *     `floor(scale·(t_b+1)/(s_b+1))` summed over gram occurrences, not a
  *     log-ratio sum: a multiplicative normalization constant factors out
  *     of a ratio SUM's ranking, the +1 smoothing matches the paper, and
  *     integer floor division is bit-identical in every engine (a float
  *     log would make the oracle FP-luck — the repo-wide lesson);
  *   - selection is deterministic top-k with an MD5 tiebreak instead of
  *     Gumbel-noise sampling: same resampling-without-replacement shape,
  *     reproducible under retries and re-runs ([[Sampling]]'s rationale).
  *
  * Scale shape: two corpus scans and NO corpus-keyed shuffle. Scan 1
  * explodes gram occurrences and partial-aggregates conditional counts
  * into `nBuckets` rows (the hashed feature table — fixed size, broadcast
  * back). Scan 2 re-explodes, probes the broadcast ratio table, and
  * partial-aggregates per-document sums. Top-k rides the two-phase
  * sharded [[TopK]] so the global rank never funnels the corpus through
  * one task.
  */
object ImportanceResampling {

  /** Engine-portable feature bucket: first 8 md5 hex chars mod nBuckets
    * (the [[Sampling.hashUniform]] recipe, bucketed).
    */
  def bucket(gram: Column, nBuckets: Int): Column =
    pmod(conv(substring(md5(gram), 1, 8), 16, 10).cast("long"), lit(nBuckets))

  /** Word n-gram OCCURRENCES (not distinct — a distribution, not a set). */
  private def gramOccurrences(df: DataFrame, idCol: String, textCol: String, n: Int) = {
    val t = filter(split(col(textCol), " "), x => length(x) > 0)
    val sh = when(
      size(t) >= n,
      transform(sequence(lit(0), size(t) - n), i => concat_ws(" ", slice(t, i + 1, lit(n)))))
      .otherwise(array().cast("array<string>"))
    df.select(col(idCol), col("__is_target"), explode(sh).as("gram"))
  }

  /** Score all non-target docs and keep the top `k`.
    *
    * @param targetPred rows where this is true define the target domain;
    *                   the rest are the candidate pool AND the source
    *                   (raw) distribution.
    * @return (idCol, score, n_grams, rk) for the k kept docs, rk 1..k by
    *         (score desc, md5(id), id).
    */
  def resampleTopK(
      corpus: DataFrame,
      idCol: String,
      textCol: String,
      targetPred: Column,
      n: Int,
      nBuckets: Int,
      scale: Long,
      k: Int): DataFrame = {
    require(nBuckets > 0 && scale > 0 && k > 0 && n > 0)
    val flagged = corpus.withColumn("__is_target", targetPred)
    val grams = gramOccurrences(flagged, idCol, textCol, n)
      .withColumn("b", bucket(col("gram"), nBuckets))

    // scan 1: hashed-feature counts for both distributions in ONE pass
    val buckets = grams
      .groupBy("b")
      .agg(
        sum(when(col("__is_target"), 1L).otherwise(0L)).as("t_cnt"),
        sum(when(col("__is_target"), 0L).otherwise(1L)).as("s_cnt"))
      // floor-division integer ratio; +1 smoothing keeps unseen-in-target
      // buckets at a small nonzero weight exactly like the paper's
      .withColumn("r", expr(s"CAST($scale * (t_cnt + 1) AS BIGINT) div (s_cnt + 1)"))
      .select("b", "r")

    // scan 2: candidate docs probe the broadcast ratio table
    val scored = grams
      .filter(!col("__is_target"))
      .join(broadcast(buckets), "b")
      .groupBy(col(idCol))
      .agg(sum(col("r")).as("score"), count(lit(1)).as("n_grams"))

    TopK.perGroup(
      scored,
      groupCols = Seq.empty,
      order = Seq(col("score").desc, md5(col(idCol).cast("string")).asc, col(idCol).asc),
      k = k)
  }
}
