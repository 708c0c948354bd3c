package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-core decomposition by synchronous peeling — the dense-subgraph
  * extractor of the graph tier (spam/link-farm detection over the
  * near-dup graph, community cores before sampling): repeatedly drop
  * every node whose degree among SURVIVORS is < k, all at once.
  *
  * Fixed-round contract (the [[LabelPropagation]] discipline): exactly
  * `rounds` synchronous peels, so a SQL oracle replays the rounds
  * verbatim. Peeling is monotone (survivor sets only shrink), so once a
  * round removes nothing every later round is a no-op — `rounds` ≥ the
  * peel depth yields the TRUE k-core, and the spec cross-checks against
  * a run-to-fixpoint brute force. Peel depth is typically tiny (each
  * round must delete ≥ 1 node to matter, and real corpora peel in a
  * handful of waves).
  *
  * Scale shape per round: one (edge ⋈ survivors) hash join per endpoint,
  * one map-side-combined degree count, one semi-join back — no windows,
  * no collect; survivors localCheckpoint each round to truncate lineage.
  */
object KCore {

  /** Survivors of `rounds` synchronous k-peels with their final degree:
    * (id, degree). `edges` (a, b) must contain both directions of each
    * undirected edge; degree counts rows with b = the node.
    */
  def core(
      nodes: DataFrame, // (id)
      edges: DataFrame, // (a, b), both directions
      k: Int,
      rounds: Int): DataFrame = {
    require(k >= 1 && rounds >= 1, s"k/rounds must be >= 1: $k, $rounds")
    val e = edges.select(col("a"), col("b"))
    var cur = nodes.select(col("id")).distinct()
    (1 to rounds).foreach { _ =>
      val deg = e
        .join(cur.select(col("id").as("a")), "a")
        .join(cur.select(col("id").as("b")), "b")
        .groupBy(col("b").as("id"))
        .agg(count(lit(1)).as("d"))
      cur = cur
        .join(deg.filter(col("d") >= k).select("id"), "id")
        .transform(graft.core.Materialize.apply)
    }
    val finalDeg = e
      .join(cur.select(col("id").as("a")), "a")
      .join(cur.select(col("id").as("b")), "b")
      .groupBy(col("b").as("id"))
      .agg(count(lit(1)).as("degree"))
    cur.join(finalDeg, "id")
  }
}
