package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PageRank in EXACT INTEGER arithmetic: ranks are scaled longs, a
  * node's out-contribution is floor(rank/outdeg), and the damping update
  * is floor-division by 100 — every engine computes the identical
  * numbers in any execution order (integer sums commute), so a k-round
  * run is exactly SQL-oracle-able with k unrolled rounds. The floors
  * lose < outdeg·1/scale of mass per node per round — ranking-irrelevant
  * at scale=10¹² — in exchange for bit-exact portability (the repo's
  * k-means/likelihood-ratio recipe applied to an iterative graph
  * algorithm).
  *
  * Scale shape per iteration: one (edge ⋈ rank) hash join on the source
  * id, one map-side-combined sum by destination, one left join back to
  * the node set; state localCheckpoints each round to truncate lineage
  * (the [[Dedup.connectedComponents]] discipline). Long arithmetic holds
  * while 85·n·scale < 2⁶³ (switch scale down or DECIMAL up past ~10⁵
  * nodes at 10¹² — documented, not silently wrong: ANSI mode throws on
  * overflow).
  */
object PageRank {

  /** PERSONALIZED PageRank under the same exact-integer contract: the
    * restart mass concentrates on `sources` instead of spreading
    * uniformly — rank₀ = scale on sources / 0 elsewhere, and each round's
    * base term (15 % restart) pays out only to sources. The
    * retrieval/graph-expansion form ("importance relative to THIS seed
    * set"): same per-iteration shape as [[ranks]], sources ride as a
    * semi-joinable relation (never a driver collection).
    */
  def personalizedRanks(
      nodes: DataFrame, // (id)
      edges: DataFrame, // (a, b) DIRECTED; pass both directions for undirected
      sources: DataFrame, // (id)
      iters: Int,
      scale: Long = 1000000000000L): DataFrame = {
    require(iters >= 1 && scale > 0)
    val ids = nodes.select(col("id")).distinct()
    val src = sources.select(col("id")).distinct()
    val e = edges.select(col("a"), col("b"))
    val outdeg = e.groupBy(col("a").as("id")).agg(count(lit(1)).as("d"))
    val withBase = ids
      .join(src.withColumn("__s", lit(1)), Seq("id"), "left")
      .select(col("id"), coalesce(col("__s"), lit(0)).as("isSrc"))
    var ranks = withBase
      .select(col("id"), (col("isSrc").cast("long") * scale).as("rank"))
    val base = (15L * scale) / 100L
    (1 to iters).foreach { _ =>
      val contribs = e
        .join(ranks.select(col("id").as("a"), col("rank")), "a")
        .join(outdeg.select(col("id").as("a"), col("d")), "a")
        .select(col("b").as("id"), expr("rank div d").as("c"))
        .groupBy("id")
        .agg(sum("c").as("s"))
      ranks = withBase
        .join(contribs, Seq("id"), "left")
        .select(
          col("id"),
          (col("isSrc").cast("long") * base +
            expr("(85 * coalesce(s, 0L)) div 100")).as("rank"))
        .transform(graft.core.Materialize.apply)
    }
    ranks
  }

  /** (id, rank) after `iters` damped rounds; rank₀ = scale per node. */
  def ranks(
      nodes: DataFrame, // (id)
      edges: DataFrame, // (a, b) DIRECTED; pass both directions for undirected
      iters: Int,
      scale: Long = 1000000000000L): DataFrame = {
    require(iters >= 1 && scale > 0)
    val ids = nodes.select(col("id")).distinct()
    val e = edges.select(col("a"), col("b"))
    val outdeg = e.groupBy(col("a").as("id")).agg(count(lit(1)).as("d"))
    var ranks = ids.withColumn("rank", lit(scale))
    val base = (15L * scale) / 100L
    (1 to iters).foreach { _ =>
      val contribs = e
        .join(ranks.select(col("id").as("a"), col("rank")), "a")
        .join(outdeg.select(col("id").as("a"), col("d")), "a")
        .select(col("b").as("id"), expr("rank div d").as("c"))
        .groupBy("id")
        .agg(sum("c").as("s"))
      ranks = ids
        .join(contribs, Seq("id"), "left")
        .select(
          col("id"),
          (lit(base) + expr("(85 * coalesce(s, 0L)) div 100")).as("rank"))
        .transform(graft.core.Materialize.apply)
    }
    ranks
  }
}
