package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** B³ (B-cubed) clustering evaluation — THE standard extrinsic score
  * for entity-resolution / dedup clusterings (Bagga & Baldwin 1998;
  * Amigó et al. 2009 showed it's the only common metric satisfying all
  * four clustering-evaluation axioms): for each ITEM, precision is the
  * fraction of its cluster sharing its gold label and recall the
  * fraction of its label class sharing its cluster, then average over
  * items. Pairwise P/R ([[BlockingQuality]]'s counts) over-weights big
  * clusters quadratically; B³ weights every item once — the difference
  * that matters when dedup clusters are power-law sized.
  *
  * Item-grain identity that makes it one histogram pass: with n_cl =
  * |cluster c ∩ label l|, Σ_items P(item) = Σ_cells n_cl²/n_c and
  * Σ_items R(item) = Σ_cells n_cl²/n_l. The engine's DEFINED floors:
  *   cell_p = (10⁶·n_cl·n_cl) div n_c   (per-cell ppm mass),
  *   p_ppm  = (Σ cell_p) div n,          and symmetrically r_ppm;
  *   f1_ppm = (2·p_ppm·r_ppm) div (p_ppm + r_ppm)   (0 when both 0)
  * — two documented floors (per cell, then the mean), engine-exact.
  *
  * Scale shape: one groupBy to (cluster, label) cell grain (map-side
  * combinable), two marginal aggregates OF the cell relation, one
  * single-row reduce. Nothing item-grain shuffles twice. Width:
  * 10⁶·n_cl² widens through DECIMAL(38,0) — safe for n_cl < 10¹⁵.
  *
  * Output: one row (n, n_clusters, n_labels, p_ppm, r_ppm, f1_ppm).
  */
object BCubed {

  def score(
      assign: DataFrame, // (id, cluster, label)
      clusterCol: String = "cluster",
      labelCol: String = "label"): DataFrame = {
    val cells = assign
      .select(
        col(clusterCol).cast("string").as("c"),
        col(labelCol).cast("string").as("l"))
      .groupBy("c", "l").agg(count(lit(1)).as("n_cl"))
    val nc = cells.groupBy("c").agg(sum("n_cl").as("n_c"))
    val nl = cells.groupBy("l").agg(sum("n_cl").as("n_l"))
    val scored = cells
      .join(nc, "c")
      .join(nl, "l")
      .agg(
        coalesce(sum("n_cl"), lit(0L)).cast("long").as("n"),
        count_distinct(col("c")).as("n_clusters"),
        count_distinct(col("l")).as("n_labels"),
        sum(expr("(1000000 * CAST(n_cl AS DECIMAL(38,0)) * n_cl) div n_c"))
          .cast("decimal(38,0)").as("__p"),
        sum(expr("(1000000 * CAST(n_cl AS DECIMAL(38,0)) * n_cl) div n_l"))
          .cast("decimal(38,0)").as("__r"))
    scored
      .select(
        when(col("n") === 0L,
          raise_error(lit("BCubed.score: no rows")).cast("long"))
          .otherwise(col("n")).as("n"),
        col("n_clusters"), col("n_labels"),
        // the n = 0 case is unreachable past the raise above — the guards
        // only keep the ANSI divide-by-zero from firing first with the
        // wrong error name
        expr("CASE WHEN n = 0 THEN 0L ELSE __p div n END").as("p_ppm"),
        expr("CASE WHEN n = 0 THEN 0L ELSE __r div n END").as("r_ppm"))
      .withColumn("f1_ppm", expr(
        """CASE WHEN p_ppm + r_ppm = 0 THEN 0L
          |ELSE (2 * p_ppm * r_ppm) div (p_ppm + r_ppm) END""".stripMargin))
  }
}
