package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Neighborhood-overlap link prediction over an undirected graph: for
  * every NON-adjacent pair (x, y) sharing at least `minCommon`
  * neighbors, the three classical scores — common-neighbor count,
  * Jaccard overlap in basis points, and the Adamic–Adar-family
  * resource-allocation index Σ_z 1/deg(z) in exact ppm (per-wedge
  * ⌊10⁶/deg(z)⌋ summed, so the value is engine-exact) — the "who should
  * be linked next" report that closes the graph tier (triangles →
  * clustering coefficient → components → prediction).
  *
  * Scale shape: one wedge self-join of the symmetric adjacency on the
  * CENTER node, grouped straight to (x, y) — cost is Σ_z deg(z)², which
  * a single celebrity center makes quadratic, so centers above
  * `maxCenterDegree` are excluded from wedge formation (the standard
  * practice: a million-degree hub certifies nothing — its RA weight is
  * ~0 and its common-neighbor evidence is noise; the cap bounds wedges
  * by m·maxCenterDegree). Degrees for the RA weight and the Jaccard
  * denominator stay FULL-graph degrees. Existing edges leave by one
  * anti-join; nothing materializes adjacency lists per node.
  *
  * Output: (x, y, n_common, jaccard_bp, ra_ppm), x < y, with
  * jaccard_bp = ⌊10⁴·|N(x)∩N(y)| / (deg(x)+deg(y)−|N(x)∩N(y)|)⌋
  * (x, y non-adjacent ⇒ the union has no x/y self term).
  */
object LinkPrediction {

  /** `edges`: undirected pairs (a, b), a ≠ b, duplicates tolerated. */
  def scores(
      edges: DataFrame,
      minCommon: Int = 2,
      maxCenterDegree: Int = 10000): DataFrame = {
    require(minCommon >= 1, s"LinkPrediction.scores: minCommon must be >= 1, got $minCommon")
    require(maxCenterDegree >= 2,
      s"LinkPrediction.scores: maxCenterDegree must be >= 2, got $maxCenterDegree")
    val und = edges.select(col("a").cast("long").as("a"), col("b").cast("long").as("b"))
      .filter(col("a") =!= col("b"))
      .select(least(col("a"), col("b")).as("a"), greatest(col("a"), col("b")).as("b"))
      .distinct()
    val sym = und.select(col("a").as("z"), col("b").as("v"))
      .unionByName(und.select(col("b").as("z"), col("a").as("v")))
    val deg = sym.groupBy("z").agg(count(lit(1)).as("d"))
    // wedge centers: full-graph degree rides along for the RA weight
    val centers = sym.join(deg.filter(col("d") <= maxCenterDegree), "z")
    val wedges = centers.select(col("z"), col("v").as("x"), col("d"))
      .join(centers.select(col("z"), col("v").as("y")), "z")
      .filter(col("x") < col("y"))
    val grouped = wedges.groupBy("x", "y").agg(
      count(lit(1)).as("n_common"),
      sum(expr("1000000 div d")).as("ra_ppm"))
    grouped
      .filter(col("n_common") >= minCommon)
      .join(und, grouped("x") === und("a") && grouped("y") === und("b"), "left_anti")
      .join(deg.select(col("z").as("x"), col("d").as("dx")), "x")
      .join(deg.select(col("z").as("y"), col("d").as("dy")), "y")
      .select(
        col("x"), col("y"), col("n_common"),
        expr("(10000 * n_common) div (dx + dy - n_common)").as("jaccard_bp"),
        col("ra_ppm"))
  }
}
