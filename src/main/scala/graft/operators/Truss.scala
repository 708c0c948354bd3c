package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-truss decomposition by synchronous EDGE peeling — the
  * triangle-grade dense-core extractor one level above [[KCore]] (Cohen
  * 2008): repeatedly drop every edge whose support (triangles through
  * it among SURVIVING edges) is < k−2, all at once. A k-truss is the
  * community-core standard the node-grade k-core can't give: every
  * surviving edge is embedded in ≥ k−2 mutual-neighbor witnesses, so
  * chains and hub-spokes peel away while genuinely cohesive groups
  * stay (tie-strength reading: [[Triangles.edgeSupport]]'s strong-tie
  * signal made recursive).
  *
  * Fixed-round contract (the [[KCore]]/[[LabelPropagation]] discipline):
  * exactly `rounds` synchronous peels, so a SQL oracle replays the
  * rounds verbatim; peeling is monotone (edge sets only shrink), so
  * once a round removes nothing the iteration is at the TRUE k-truss,
  * and the spec cross-checks a run-to-fixpoint brute force.
  *
  * Scale shape per round: one [[Triangles.edgeSupport]] pass over the
  * survivors — the degree-oriented O(m^1.5) wedge join, never Σd²
  * — plus one filter; survivors re-materialize each round under the
  * [[graft.core.Materialize]] policy to keep plans linear in rounds.
  *
  * Output: surviving edges with their final support among survivors:
  * (a, b, support), a < b, support ≥ k−2 wherever a further round
  * would remove nothing.
  */
object Truss {

  def peel(edges: DataFrame, k: Int, rounds: Int): DataFrame = {
    require(k >= 3, s"Truss.peel: k must be >= 3 (k-2 witnesses per edge), got $k")
    require(rounds >= 1, s"Truss.peel: rounds must be >= 1, got $rounds")
    // materialize the canonical edge set BEFORE the first support pass:
    // edgeSupport/enumerate consume their input ~6 times (degree calc,
    // orientation joins, wedge close, support join-back), and an
    // unmaterialized upstream (e.g. a whole SimHash near-dup pipeline)
    // would re-execute per consumption — measured 52 s -> ~12 s at sf0.1
    var cur = edges
      .select(col("a").cast("long").as("a"), col("b").cast("long").as("b"))
      .filter(col("a") =!= col("b"))
      .select(least(col("a"), col("b")).as("a"), greatest(col("a"), col("b")).as("b"))
      .distinct()
      .transform(graft.core.Materialize.apply)
    var curN = cur.count()
    // each round's support relation materializes once and its filter is
    // read off it; when a round removes NOTHING the materialized support
    // IS the final answer (peeling is monotone), so the run-to-converged
    // case pays r+1 support passes, not rounds+1 — identical output to
    // the unrolled fixed-round contract, one Σ-triangle pass cheaper
    // `cur` is canonical (a < b, distinct) here and stays canonical across
    // rounds (survivor sets are subsets), so each support pass skips the
    // re-normalize + distinct Exchange that edgeSupport would re-apply
    for (_ <- 1 to rounds) {
      val sup = Triangles.edgeSupportNormalized(cur)
        .transform(graft.core.Materialize.apply)
      val next = sup.filter(col("support") >= k - 2).select("a", "b")
      val nextN = next.count()
      if (nextN == curN) return sup
      cur = next
      curN = nextN
    }
    Triangles.edgeSupportNormalized(cur)
  }
}
