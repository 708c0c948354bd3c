package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bipartite projection — THE recsys graph builder: from (user, item)
  * interactions to the item–item co-occurrence graph (co-purchase,
  * co-view, co-edit), edges weighted by how many users share the pair.
  * Everything downstream ([[LinkPrediction]], [[Triangles]],
  * [[PageRank]], [[GraphStats]]) runs on its output.
  *
  * Scale shape: one wedge self-join on the USER — cost Σ_u d(u)², which
  * one power user makes quadratic, so users above `maxUserDegree` are
  * excluded from pair formation (standard practice: a user who touched
  * half the catalog certifies nothing about item affinity; wedges
  * bounded by |interactions|·cap). `minShared` prunes the long tail of
  * coincidence pairs BEFORE they leave the aggregation (map-side
  * combined counts, filter on the grouped grain).
  *
  * Output: (i, j, n_shared), i < j, co-occurrence count over capped
  * users, only pairs with n_shared ≥ minShared.
  */
object BipartiteProject {

  def project(
      interactions: DataFrame,
      userCol: String,
      itemCol: String,
      minShared: Long = 2L,
      maxUserDegree: Int = 10000): DataFrame = {
    require(minShared >= 1, s"BipartiteProject.project: minShared >= 1, got $minShared")
    require(maxUserDegree >= 2,
      s"BipartiteProject.project: maxUserDegree >= 2, got $maxUserDegree")
    val e = interactions.select(
      col(userCol).cast("long").as("u"),
      col(itemCol).cast("long").as("item")).distinct()
    val keep = e.join(
      e.groupBy("u").agg(count(lit(1)).as("d")).filter(col("d") <= maxUserDegree),
      "u")
    keep.select(col("u"), col("item").as("i"))
      .join(keep.select(col("u"), col("item").as("j")), "u")
      .filter(col("i") < col("j"))
      .groupBy("i", "j")
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }
}
