package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Synchronous label propagation (Raghavan et al. 2007) — the community
  * pass of the graph tier: each round every node adopts its neighbors'
  * PLURALITY label. Communities group the near-dup/citation/interaction
  * graph one level coarser than connected components (which
  * [[Dedup.connectedComponents]] already covers): bridges survive CC but
  * dissolve under plurality voting.
  *
  * Determinism contract (the repo's exact-replay discipline applied to a
  * vote): labels start as the node id; a round is
  *   label'(v) = argmax over neighbor labels L of (count(L), −L)
  * i.e. ties break toward the SMALLEST label, isolated nodes keep their
  * label, and all nodes update simultaneously from the previous round's
  * labels. Integer counts + a total-order tie-break mean any engine
  * replays the rounds bit-for-bit (no async/random-order variance — the
  * asynchronous variant of the paper is explicitly traded away for
  * oracle-ability; synchronous LPA is the standard Pregel formulation).
  *
  * Scale shape per round: one (edge ⋈ label) hash join on the neighbor
  * id, one map-side-combined (node, label) count, one two-level argmax
  * via max(struct(cnt, −label)) — max() is associative/commutative, so
  * the plurality pick partial-aggregates map-side; then a left join back
  * to the node set. No window over a node's full neighborhood, no
  * collect. State localCheckpoints each round to truncate lineage (the
  * [[PageRank.ranks]] discipline). Celebrity nodes cost one skewed-key
  * aggregation (AQE-splittable), never a single-task sort.
  */
object LabelPropagation {

  /** (id, label) after `iters` synchronous plurality rounds.
    * `edges` (a, b) is DIRECTED adjacency: pass both directions for an
    * undirected graph (votes flow a→b along each row).
    */
  def propagate(
      nodes: DataFrame, // (id)
      edges: DataFrame, // (a, b): b receives a's label as a vote
      iters: Int): DataFrame = {
    require(iters >= 1, s"iters must be >= 1: $iters")
    val ids = nodes.select(col("id")).distinct()
    val e = edges.select(col("a"), col("b"))
    var labels = ids.withColumn("label", col("id").cast("long"))
    (1 to iters).foreach { _ =>
      val votes = e
        .join(labels.select(col("id").as("a"), col("label")), "a")
        .groupBy(col("b").as("id"), col("label"))
        .agg(count(lit(1)).as("cnt"))
        .groupBy("id")
        .agg(max(struct(col("cnt"), (-col("label")).as("nl"))).as("top"))
        .select(col("id"), (-col("top.nl")).as("win"))
      labels = labels
        .join(votes, Seq("id"), "left")
        .select(col("id"), coalesce(col("win"), col("label")).as("label"))
        .transform(graft.core.Materialize.apply)
    }
    labels
  }

  /** Community roll-up: (label, n_members), the size distribution
    * curation reads (giant-community share, singleton count).
    */
  def communities(labels: DataFrame): DataFrame =
    labels.groupBy("label").agg(count(lit(1)).as("n_members"))
}
