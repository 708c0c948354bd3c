package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Newman modularity of a community assignment — the quality score that
  * closes the repo's community loop: [[LabelPropagation]] (and the
  * [[Dedup.connectedComponents]] families) PRODUCE partitions; this
  * operator says how good one is, per community and in total, so two
  * clusterings of the same corpus graph compare on one number.
  *
  * Q = Σ_c (e_c/m − (d_c/2m)²) over an UNDIRECTED graph with m edges,
  * where e_c = intra-community edges and d_c = Σ degrees in c (Newman &
  * Girvan 2004). Kept EXACT: multiplying out by 4m²,
  *   Q·4m² = Σ_c (4·m·e_c − d_c²),
  * an integer, so modularity_ppm = (10⁶·Σ_c(4·m·e_c − d_c²)) div (4·m²)
  * replays bit-for-bit in any engine (signed div truncates toward zero on
  * both sides — the q223 discipline). Per-community contribs floor at the
  * same scale, so the table names WHICH communities carry the structure.
  *
  * Scale shape: edges canonicalize + dedupe once (one shuffle); degrees
  * are one map-side-combinable groupBy; e_c is the edge relation joined
  * to the (broadcast-or-shuffle, Spark picks) label relation on BOTH
  * endpoints and filtered to equal labels — no wedge or pair blow-up
  * anywhere, everything linear in |E|. Nodes in `labels` but in no edge
  * contribute degree 0 and change nothing, matching the definition.
  *
  * Output, one row per community with any member node, ordered by label:
  * (label, n_nodes, e_in, d_tot, contrib_ppm, modularity_ppm) — the
  * scalar Q repeated per row (the [[Concentration]] gini idiom). Width
  * contract: 4·m² < 10³⁸ (m ≲ 10¹⁸) internally in DECIMAL(38,0);
  * contrib/total ppm values are BIGINT by construction (|Q| ≤ 1).
  */
object Modularity {

  /** `edges`: (a, b) undirected (either orientation, duplicates/self
    * loops dropped); `labels`: (id, label) — every edge endpoint must
    * carry exactly one label (enforced by an inner join + count check).
    */
  def score(edges: DataFrame, labels: DataFrame): DataFrame = {
    // materialize the canonical edge set once: it is consumed by the
    // degree pass, the within-community join AND a separate m = count()
    // ACTION — an unmaterialized upstream (e.g. a whole SimHash near-dup
    // pipeline) re-executes per consumption (same effect Triangles /
    // Truss measured; q227's plan carried 106 Exchange nodes before this)
    val e = graft.core.Materialize(edges.select(
      least(col("a").cast("long"), col("b").cast("long")).as("x"),
      greatest(col("a").cast("long"), col("b").cast("long")).as("y"))
      .filter(col("x") =!= col("y"))
      .distinct())
    val lab = labels.select(
      col("id").cast("long").as("id"),
      col("label").cast("string").as("label"))
    val deg = e.select(col("x").as("id"))
      .unionByName(e.select(col("y").as("id")))
      .groupBy("id").agg(count(lit(1)).as("d"))
    // an endpoint with no label would silently vanish from e_c — reject
    val degLab = deg.join(lab, Seq("id"), "left")
      .select(
        col("id"),
        when(col("label").isNull,
          raise_error(concat(
            lit("Modularity.score: edge endpoint without a label: "),
            col("id").cast("string"))))
          .otherwise(col("label")).as("label"),
        col("d"))
    val perC = degLab.groupBy("label")
      .agg(count(lit(1)).as("n_nodes"), sum("d").as("d_tot"))
    val eIn = e
      .join(degLab.select(col("id").as("x"), col("label").as("lx")), "x")
      .join(degLab.select(col("id").as("y"), col("label").as("ly")), "y")
      .filter(col("lx") === col("ly"))
      .groupBy(col("lx").as("label")).agg(count(lit(1)).as("e_in"))
    val m = e.count()
    require(m > 0, "Modularity.score: the graph has no edges")
    val cells = perC.join(eIn, Seq("label"), "left")
      .select(
        col("label"), col("n_nodes"),
        coalesce(col("e_in"), lit(0L)).as("e_in"),
        col("d_tot"))
      .withColumn("__num",
        expr(s"4 * CAST(${m}L AS DECIMAL(38,0)) * e_in" +
          " - CAST(d_tot AS DECIMAL(38,0)) * d_tot"))
    val tot = cells
      .agg(sum("__num").as("__s"))
      .select(expr(
        s"(1000000 * __s) div (4 * CAST(${m}L AS DECIMAL(38,0)) * ${m}L)")
        .as("modularity_ppm"))
    cells
      .crossJoin(broadcast(tot))
      .select(
        col("label"), col("n_nodes"), col("e_in"), col("d_tot"),
        expr(s"(1000000 * __num) div (4 * CAST(${m}L AS DECIMAL(38,0)) * ${m}L)")
          .as("contrib_ppm"),
        col("modularity_ppm"))
  }
}
