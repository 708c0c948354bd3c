package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** trec_eval-shaped retrieval evaluation: a RUN (per-query ranked doc
  * list) scored against QRELS (per-query relevant set) at a cutoff k —
  * MRR, recall@k, precision@k, hit@k, all exact integers (reciprocal
  * ranks in the repo's ⌊scale/rank⌋ fixed point, rates in basis points).
  *
  * This is the general rank-AWARE eval surface the index-specific recall
  * certificates ([[SimilaritySearch.jlRecall]] and friends) are not: those
  * measure set overlap of one ANN index against its own float baseline;
  * this takes ANY two relations in the standard run/qrels shape (ANN vs
  * exact, fused hybrid vs editorial judgments, reranker vs clicks) and
  * scores position sensitivity — rank 1 vs rank 10 matters here.
  *
  * Scale shape: runs are bounded top-n relations per query (the producer's
  * contract — every retrieval operator in this repo emits bounded lists)
  * and qrels are judgment-sized, so both shuffles are metadata-grain: one
  * equi-join on (query, doc), one map-side-combinable groupBy(query). No
  * windows, no corpus contact.
  */
object RankEval {

  /** Per-query metrics at cutoff k.
    *
    * run: (qCol, dCol, rankCol) with rank 1-based, unique per (query, doc);
    * rows past the cutoff are ignored. qrels: (qCol, dCol) relevant pairs
    * (duplicates tolerated). Output one row per DISTINCT qrels query —
    * queries the run never answered still score 0 (the trec_eval
    * convention; dropping them would inflate every macro average):
    * (q, n_rel, n_rel_ret, first_rel_rank, rr_ppm, recall_bp,
    * precision_bp, hit) where first_rel_rank is NULL on a miss,
    * rr_ppm = ⌊10⁶/first_rel_rank⌋, recall = n_rel_ret/n_rel,
    * precision = n_rel_ret/k (the @k convention: the denominator is the
    * budget, not the returned count).
    */
  def perQuery(
      run: DataFrame,
      qrels: DataFrame,
      qCol: String,
      dCol: String,
      rankCol: String,
      k: Int): DataFrame = {
    require(k >= 1, s"cutoff k must be >= 1: $k")
    val r = run
      .select(col(qCol).as("q"), col(dCol).as("d"), col(rankCol).cast("long").as("rank"))
      .filter(col("rank") <= k)
      // a doc listed twice in a run (fused lists, retry artifacts) counts
      // once, at its best rank — without this a duplicate hit would
      // inflate n_rel_ret past n_rel
      .groupBy("q", "d").agg(min("rank").as("rank"))
    val rels = qrels
      .select(col(qCol).as("q"), col(dCol).as("d"))
      .dropDuplicates("q", "d")
    val nRel = rels.groupBy("q").agg(count(lit(1)).as("n_rel"))
    val hits = r
      .join(rels, Seq("q", "d"))
      .groupBy("q")
      .agg(count(lit(1)).as("n_rel_ret"), min("rank").as("first_rel_rank"))
    nRel
      .join(hits, Seq("q"), "left")
      .select(
        col("q"),
        col("n_rel"),
        coalesce(col("n_rel_ret"), lit(0L)).as("n_rel_ret"),
        col("first_rel_rank"),
        coalesce(expr("1000000 div first_rel_rank"), lit(0L)).as("rr_ppm"),
        expr("(10000 * coalesce(n_rel_ret, 0)) div n_rel").as("recall_bp"),
        expr(s"(10000 * coalesce(n_rel_ret, 0)) div $k").as("precision_bp"),
        (coalesce(col("n_rel_ret"), lit(0L)) > 0).as("hit"))
  }

  /** Macro summary over [[perQuery]]: one row
    * (n_queries, mrr_ppm, recall_bp, precision_bp, hit_rate_bp) —
    * floor-divided means of the per-query integers (each per-query number
    * is itself exact, so the summary is engine-portable to the last bit).
    */
  def summary(
      run: DataFrame,
      qrels: DataFrame,
      qCol: String,
      dCol: String,
      rankCol: String,
      k: Int): DataFrame =
    perQuery(run, qrels, qCol, dCol, rankCol, k)
      .agg(
        count(lit(1)).as("n_queries"),
        sum("rr_ppm").as("sum_rr"),
        sum("recall_bp").as("sum_recall"),
        sum("precision_bp").as("sum_precision"),
        sum(col("hit").cast("long")).as("n_hit"))
      .select(
        col("n_queries"),
        expr("sum_rr div n_queries").as("mrr_ppm"),
        expr("sum_recall div n_queries").as("recall_bp"),
        expr("sum_precision div n_queries").as("precision_bp"),
        expr("(10000 * n_hit) div n_queries").as("hit_rate_bp"))
}
