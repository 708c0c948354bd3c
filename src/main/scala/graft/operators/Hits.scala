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

  /** CONVERGED HITS — the fixed-point form [[scores]]' unrolled walk is
    * not: after each of the k update halves the scores renormalize to
    * ppm-of-the-max (floor division, engine-exact), so magnitudes stay
    * ≤ `scale` for ANY k and the iteration can run to convergence
    * instead of stopping at the width limit. The classical L∞-normalized
    * power iteration on AᵀA / AAᵀ, in integers: each round is
    *   a(i) = Σ_{j→i} h(j),  a ← (scale·a) div max(a),
    *   h(i) = Σ_{i→j} a(j),  h ← (scale·h) div max(h),
    * (an all-zero side — a graph with no edges into any node — floors at
    * 0 rather than dividing by it). Floors lose < 1/scale of relative
    * mass per round; at ppm scale rankings stabilize in a handful of
    * rounds (spec-pinned) and every engine replays the identical longs.
    *
    * Scale shape per round: the same 2 hash joins + 2 map-side-combinable
    * sums as [[scores]] plus TWO broadcast single-row maxima; per-round
    * products ride DECIMAL(38,0) (sums ≤ d_max·scale never overflow a
    * long for d_max < 9.2·10¹²; the ×scale rescale widens before
    * multiplying), state re-materializes each round under the
    * [[graft.core.Materialize]] policy to keep plans linear in k.
    *
    * Output: (id, auth_ppm, hub_ppm) — BIGINT in [0, scale], the top
    * authority/hub at exactly `scale`.
    */
  def normalizedScores(
      edges: DataFrame,
      iters: Int,
      scale: Long = 1000000L): DataFrame = {
    require(iters >= 1, s"Hits.normalizedScores: iters must be >= 1, got $iters")
    require(scale >= 1, s"Hits.normalizedScores: scale must be >= 1, got $scale")
    val e = edges.select(
      col("src").cast("long").as("src"),
      col("dst").cast("long").as("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct()
    val nodes = e.select(col("src").as("id"))
      .unionByName(e.select(col("dst").as("id"))).distinct()
      .transform(graft.core.Materialize.apply)
    def renorm(df: DataFrame, c: String): DataFrame = {
      val mx = df.agg(max(col(c)).as("__mx"))
      df.crossJoin(broadcast(mx))
        .select(
          col("id"),
          expr(s"""CASE WHEN __mx = 0 THEN 0L
                   ELSE (CAST($c AS DECIMAL(38,0)) * ${scale}L) div __mx
                   END""").as(c))
    }
    var h = nodes.select(col("id"), lit(scale).as("h"))
    var a = nodes.select(col("id"), lit(0L).as("a"))
    for (_ <- 1 to iters) {
      a = renorm(
        nodes.join(
          e.join(h.select(col("id").as("src"), col("h")), "src")
            .groupBy(col("dst").as("id")).agg(sum("h").as("a0")),
          Seq("id"), "left")
          .select(col("id"), coalesce(col("a0"), lit(0L)).as("a")),
        "a").transform(graft.core.Materialize.apply)
      h = renorm(
        nodes.join(
          e.join(a.select(col("id").as("dst"), col("a")), "dst")
            .groupBy(col("src").as("id")).agg(sum("a").as("h0")),
          Seq("id"), "left")
          .select(col("id"), coalesce(col("h0"), lit(0L)).as("h")),
        "h").transform(graft.core.Materialize.apply)
    }
    nodes.join(a, "id").join(h, "id")
      .select(col("id"), col("a").as("auth_ppm"), col("h").as("hub_ppm"))
  }
}
