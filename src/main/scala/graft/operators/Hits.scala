package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** HITS hub/authority scoring (Kleinberg 1999) over a directed graph,
  * UNROLLED and UNNORMALIZED: h⁰ ≡ 1, then aᵏ(i) = Σ_{j→i} hᵏ⁻¹(j) and
  * hᵏ(i) = Σ_{i→j} aᵏ(j) for a fixed iteration count — every value a
  * plain integer (walk counts into/out of the node), so the scores are
  * bit-exact in any engine and the oracle is k unrolled SQL rounds
  * (normalization only matters for convergence of the limit; after a
  * FIXED k it is a monotone rescaling that changes no ranking). The
  * classic bipartite read: on a customer→supplier purchase graph,
  * authorities are suppliers bought by well-connected customers, hubs
  * are customers buying from authoritative suppliers — the
  * direction-aware centrality [[PageRank]] (random surfer) does not
  * give.
  *
  * Scale shape: per iteration, ONE aggregate of the edge relation per
  * direction joined back to edges — 2k hash joins + 2k
  * map-side-combinable sums on the (src, dst) grain; the iteration rides
  * DECIMAL(38,0) internally, and the OUTPUT is BIGINT under the width
  * contract d^(2k−1)·n < 2⁶³ (k = 2 keeps magnitudes ≤ d³·n — wide data
  * wants small k anyway); a graph that breaks the contract fails loudly
  * at the final ANSI decimal→long cast rather than shipping a
  * DECIMAL-typed column (which hash-mismatches cross-engine comparison
  * even on identical values). Nodes with no in-edges report authority 0;
  * no out-edges, hub 0.
  *
  * Output: (id, auth, hub), one row per node appearing in any edge.
  */
object Hits {

  def scores(edges: DataFrame, iters: Int = 2): DataFrame = {
    require(iters >= 1 && iters <= 4, s"Hits.scores: iters must be in [1, 4], got $iters")
    val e = edges.select(
      col("src").cast("long").as("src"),
      col("dst").cast("long").as("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct()
    val nodes = e.select(col("src").as("id"))
      .unionByName(e.select(col("dst").as("id"))).distinct()
    var h = nodes.select(col("id"), lit(1L).cast("decimal(38,0)").as("h"))
    var a = nodes.select(col("id"), lit(0L).cast("decimal(38,0)").as("a"))
    for (_ <- 1 to iters) {
      a = nodes.join(
        e.join(h.select(col("id").as("src"), col("h")), "src")
          .groupBy(col("dst").as("id")).agg(sum("h").as("a0")),
        Seq("id"), "left")
        .select(col("id"), coalesce(col("a0"), lit(0L).cast("decimal(38,0)")).as("a"))
      h = nodes.join(
        e.join(a.select(col("id").as("dst"), col("a")), "dst")
          .groupBy(col("src").as("id")).agg(sum("a").as("h0")),
        Seq("id"), "left")
        .select(col("id"), coalesce(col("h0"), lit(0L).cast("decimal(38,0)")).as("h"))
    }
    nodes.join(a, "id").join(h, "id")
      .select(
        col("id"),
        col("a").cast("long").as("auth"),
        col("h").cast("long").as("hub"))
  }
}
