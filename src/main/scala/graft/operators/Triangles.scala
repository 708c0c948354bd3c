package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact triangle enumeration over an undirected edge set — the graph-
  * analytics step past connected components ([[Dedup.connectedComponents]]):
  * triangle density separates tight duplicate cliques from chains of
  * borderline pairs, and per-node triangle counts feed clustering
  * coefficients.
  *
  * Scale shape is the standard DEGREE ORIENTATION: each edge points from
  * its lower-(degree, id) endpoint to the higher, wedges form by joining
  * a node's OUT-edges — so a hub of degree d contributes min(d, d_out)²
  * wedges with d_out bounded by orientation (Σ wedges = O(m^1.5) for any
  * graph, vs Σ d² unoriented, which a single celebrity node makes
  * quadratic) — and each triangle materializes exactly once, closed by
  * one more equi-join. Three hash joins, no θ-join, no per-node
  * adjacency materialization.
  *
  * Normalization (cast/self-loop filter/canonical orientation/distinct)
  * happens exactly ONCE per public entry point: the internal passes take
  * the already-normalized edge set, because a nested `.distinct()` over
  * an identical-but-not-shared subtree is a full extra Exchange +
  * HashAggregate over the edge relation that ReuseExchange cannot elide
  * (guide §2.4 — observed as back-to-back duplicate aggregates in the
  * q100/q104/q221/q236 plans).
  */
object Triangles {

  /** Canonical undirected edge set: (a, b) longs, a < b, distinct, no
    * self-loops. Idempotent; every public entry point applies it once.
    */
  private[operators] def normalize(edges: DataFrame): DataFrame =
    edges.select(col("a").cast("long").as("a"), col("b").cast("long").as("b"))
      .filter(col("a") =!= col("b"))
      .select(least(col("a"), col("b")).as("a"), greatest(col("a"), col("b")).as("b"))
      .distinct()

  /** Triangles as (x, y, z), x < y < z, one row each.
    * `edges`: undirected pairs (a, b), a ≠ b, duplicates tolerated.
    */
  def enumerate(edges: DataFrame): DataFrame =
    enumerateNormalized(normalize(edges))

  /** [[enumerate]] over an ALREADY canonical edge set (a < b, distinct,
    * no self-loops) — skips the redundant normalization pass.
    */
  private[operators] def enumerateNormalized(und: DataFrame): DataFrame = {
    val deg = und.select(col("a").as("v"))
      .unionByName(und.select(col("b").as("v")))
      .groupBy("v").agg(count(lit(1)).as("d"))
    // orient low (d, v) → high (d, v); struct compare gives the tiebreak
    val withDeg = und
      .join(deg.select(col("v").as("a"), col("d").as("da")), "a")
      .join(deg.select(col("v").as("b"), col("d").as("db")), "b")
    val oriented = withDeg.select(
      when(struct(col("da"), col("a")) < struct(col("db"), col("b")), col("a"))
        .otherwise(col("b")).as("src"),
      when(struct(col("da"), col("a")) < struct(col("db"), col("b")), col("b"))
        .otherwise(col("a")).as("dst"),
      when(struct(col("da"), col("a")) < struct(col("db"), col("b")), col("db"))
        .otherwise(col("da")).as("dd"))
    // wedges: two out-edges of u, ordered by the same (deg, id) rank so
    // each unordered pair forms once
    val e1 = oriented.select(col("src").as("u"), col("dst").as("v"), col("dd").as("dv"))
    val e2 = oriented.select(col("src").as("u"), col("dst").as("w"), col("dd").as("dw"))
    val wedges = e1.join(e2, "u")
      .filter(struct(col("dv"), col("v")) < struct(col("dw"), col("w")))
    // close: the (v, w) edge is oriented v→w by construction (same rank order)
    val closer = oriented.select(col("src").as("v"), col("dst").as("w"))
    wedges.join(closer, Seq("v", "w"))
      .select(sort_array(array(col("u"), col("v"), col("w"))).as("t"))
      .select(
        element_at(col("t"), 1).as("x"),
        element_at(col("t"), 2).as("y"),
        element_at(col("t"), 3).as("z"))
  }

  /** Per-node local clustering coefficient in integer BASIS POINTS:
    * cc_bp = ⌊10000·2T(v) / (d(v)(d(v)−1))⌋ — how close the node's
    * neighborhood is to a clique, with the division floored so the value
    * is engine-exact. Nodes of degree < 2 report 0 (no possible wedge).
    * Output: (id, degree, n_triangles, cc_bp).
    */
  def clusteringCoefficient(edges: DataFrame): DataFrame = {
    val und = normalize(edges)
    val deg = und.select(col("a").as("id"))
      .unionByName(und.select(col("b").as("id")))
      .groupBy("id").agg(count(lit(1)).as("degree"))
    val tri = enumerateNormalized(und)
    val triPerNode = tri.select(explode(array(col("x"), col("y"), col("z"))).as("id"))
      .groupBy("id").agg(count(lit(1)).as("n_triangles"))
    deg
      .join(triPerNode, Seq("id"), "left")
      .withColumn("n_triangles", coalesce(col("n_triangles"), lit(0L)))
      .withColumn(
        "cc_bp",
        when(col("degree") < 2, lit(0L))
          .otherwise(expr("(10000 * 2 * n_triangles) div (degree * (degree - 1))")))
  }

  /** Per-EDGE triangle support — how many triangles contain each edge,
    * the k-truss building block (an edge in a k-truss sits in ≥ k−2
    * triangles) and the tie-strength signal (embedded edges are strong
    * ties; support-0 edges are bridges). Rides [[enumerate]]'s
    * degree-oriented O(m^1.5) pass: each triangle explodes into its 3
    * edges, one grouped count, one left join back so bridges report 0.
    * Output: (a, b, support), a < b, one row per distinct edge.
    */
  def edgeSupport(edges: DataFrame): DataFrame =
    edgeSupportNormalized(normalize(edges))

  /** [[edgeSupport]] over an ALREADY canonical edge set — the form the
    * [[Truss]] peel loop consumes (its survivor sets stay canonical by
    * construction, so each round skips a full re-normalize + distinct).
    */
  private[operators] def edgeSupportNormalized(und: DataFrame): DataFrame = {
    val triEdges = enumerateNormalized(und)
      .select(explode(array(
        struct(col("x").as("a"), col("y").as("b")),
        struct(col("x").as("a"), col("z").as("b")),
        struct(col("y").as("a"), col("z").as("b")))).as("e"))
      .groupBy(col("e.a").as("a"), col("e.b").as("b"))
      .agg(count(lit(1)).as("support"))
    und.join(triEdges, Seq("a", "b"), "left")
      .withColumn("support", coalesce(col("support"), lit(0L)))
  }
}
