package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Whole-graph structural statistics that read off the EDGE relation in
  * one or two aggregates — the numbers a graph pipeline checks before
  * running anything expensive over it.
  *
  * Degree assortativity (Newman 2002): do high-degree nodes attach to
  * high-degree nodes (social networks, r > 0) or to leaves (hub-spoke
  * infrastructure, r < 0)? With every undirected edge counted in BOTH
  * directions the endpoint-degree sums satisfy Σx = Σy and Σx² = Σy²,
  * collapsing Pearson's r to the SQUARE-ROOT-FREE
  *   r_ppm = (10⁶·(M·Σxy − (Σx)²)) div (M·Σx² − (Σx)²)
  * (M = directed edge count) — engine-exact where the textbook formula
  * needs a sqrt. Also reported: node/edge counts, max degree, and Σd²
  * (the wedge count driving every pair-join plan; [[LinkPrediction]]'s
  * cap decision reads it).
  *
  * Scale shape: one degree aggregate, one edge-grain join of degrees,
  * one single-row moment aggregate — DECIMAL(38,0) throughout.
  *
  * Output: one row (n_nodes, n_edges, max_degree, sum_d2,
  * assortativity_ppm); a degree-regular graph (zero variance) reports
  * 0 by convention.
  */
object GraphStats {

  def assortativity(edges: DataFrame): DataFrame = {
    val und = edges.select(col("a").cast("long").as("a"), col("b").cast("long").as("b"))
      .filter(col("a") =!= col("b"))
      .select(least(col("a"), col("b")).as("a"), greatest(col("a"), col("b")).as("b"))
      .distinct()
    val sym = und.select(col("a").as("u"), col("b").as("v"))
      .unionByName(und.select(col("b").as("u"), col("a").as("v")))
    val deg = sym.groupBy("u").agg(count(lit(1)).as("d"))
    val joined = sym
      .join(deg.select(col("u"), col("d").as("dx")), "u")
      .join(deg.select(col("u").as("v"), col("d").as("dy")), "v")
      .select(
        col("dx").cast("decimal(38,0)").as("x"),
        col("dy").cast("decimal(38,0)").as("y"))
    val degStats = deg.agg(
      count(lit(1)).as("n_nodes"),
      max("d").as("max_degree"),
      sum(expr("CAST(d AS DECIMAL(38,0)) * d")).as("sum_d2"))
    val edgeStats = und.agg(count(lit(1)).as("n_edges"))
    joined
      .agg(
        count(lit(1)).cast("decimal(38,0)").as("m"),
        sum("x").as("sx"),
        sum(expr("x * x")).as("sxx"),
        sum(expr("x * y")).as("sxy"))
      .crossJoin(broadcast(degStats))
      .crossJoin(broadcast(edgeStats))
      .select(
        col("n_nodes"),
        col("n_edges"),
        col("max_degree"),
        col("sum_d2").cast("long").as("sum_d2"),
        expr(
          """CASE WHEN m * sxx - sx * sx = 0 THEN CAST(0 AS BIGINT)
            |ELSE (1000000 * (m * sxy - sx * sx)) div (m * sxx - sx * sx) END"""
            .stripMargin).as("assortativity_ppm"))
  }
}
