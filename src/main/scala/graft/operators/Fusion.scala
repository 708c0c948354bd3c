package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Reciprocal-rank fusion (Cormack et al. 2009, public method): combine
  * several retrieval rankings into one by summing 1/(k + rank) — the
  * standard hybrid-search merge (keyword ⊕ embedding retrieval) that
  * needs no score calibration between systems, only ranks.
  *
  * Contribution is the INTEGER ⌊scale/(k + rank)⌋ (the repo's
  * float-free recipe): exact in every engine, and at scale=10⁶ the floor
  * loses < 1e-6 of the reciprocal — far below any rank-1 vs rank-2 gap.
  *
  * Scale shape: each ranking is already top-n (bounded); fusion is a
  * union of bounded relations + one small aggregation — never
  * corpus-sized. Items missing from a list simply contribute nothing
  * (the RRF convention).
  */
object Fusion {

  /** Fuse rankings (each: (idCol, rankCol), rank 1-based): output
    * (idCol, rrf, n_lists, rk) — top `topK` by (rrf desc, id).
    */
  def rrf(
      rankings: Seq[DataFrame],
      idCol: String,
      rankCol: String,
      kConst: Long,
      scale: Long,
      topK: Int): DataFrame = {
    require(rankings.nonEmpty && kConst >= 0 && scale > 0 && topK >= 1)
    val contributions = rankings
      .map(_.select(
        col(idCol),
        expr(s"$scale div ($kConst + $rankCol)").as("__c")))
      .reduce(_ unionByName _)
    val fused = contributions
      .groupBy(col(idCol))
      .agg(sum("__c").as("rrf"), count(lit(1)).as("n_lists"))
    TopK.perGroup(
      fused,
      groupCols = Seq.empty,
      order = Seq(col("rrf").desc, col(idCol).asc),
      k = topK)
  }
}
