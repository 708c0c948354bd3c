package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bounded-hop BFS distances from a source node — the reachability tier
  * (citation/link neighborhoods, contamination blast radius over the
  * near-dup graph). Synchronous frontier expansion in exact integers:
  * after round r every node within r hops holds its true hop distance,
  * nodes beyond hold −1.
  *
  * Fixed-round contract: exactly `rounds` synchronous relaxations —
  * SQL-oracle-able as unrolled rounds; rounds ≥ graph diameter gives the
  * full BFS (expansion is monotone, extra rounds are no-ops; the spec
  * cross-checks a run-to-fixpoint brute force).
  *
  * Scale shape per round: one (edge ⋈ reached-frontier) hash join, one
  * map-side-combined min per destination, one left join back — the
  * Pregel round as three DataFrame ops; distances localCheckpoint each
  * round.
  */
object Reachability {

  /** (id, dist) after `rounds` BFS rounds from `sourceId`; unreached
    * nodes carry dist = −1. `edges` (a, b) is directed a→b; pass both
    * directions for an undirected graph.
    */
  def hopDistances(
      nodes: DataFrame, // (id)
      edges: DataFrame, // (a, b)
      sourceId: Long,
      rounds: Int): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1: $rounds")
    val e = edges.select(col("a"), col("b"))
    var dist = nodes.select(col("id")).distinct()
      .withColumn("dist", when(col("id") === sourceId, 0L).otherwise(-1L))
    (1 to rounds).foreach { _ =>
      val relaxed = e
        .join(dist.filter(col("dist") >= 0).select(col("id").as("a"), col("dist")), "a")
        .groupBy(col("b").as("id"))
        .agg(min(col("dist") + 1).as("nd"))
      dist = dist
        .join(relaxed, Seq("id"), "left")
        .select(
          col("id"),
          when(col("dist") >= 0, least(col("dist"), coalesce(col("nd"), col("dist"))))
            .otherwise(coalesce(col("nd"), lit(-1L))).as("dist"))
        .transform(graft.core.Materialize.apply)
    }
    dist
  }
}
