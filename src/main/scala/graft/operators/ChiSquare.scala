package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** χ² test of independence between two categorical columns — the dataset
  * QA question "is `lang` independent of `source`?" (a skewed cell means
  * one crawl contributes all of one language — a mixing bug the marginal
  * histograms can't see). Complements [[Proportions.zTest]] (2×2 only)
  * with the general r×c table, and [[Drift.chiDrift]] (one categorical
  * vs two snapshots) with two categoricals in one snapshot.
  *
  * Exact-integer contract: with o = cell count, r = row marginal,
  * c = column marginal, n = total, the classical (o − rc/n)²/(rc/n)
  * becomes (o·n − r·c)²/(r·c·n). The engine's DEFINED statistic floors
  * that per cell in ppm:
  *   contrib_ppm(cell) = (10⁶·(o·n − r·c)²) div (r·c·n)
  * summed over OBSERVED cells plus, for each (row, col) pair absent from
  * the data (o = 0), the same formula with o = 0 — both engines
  * enumerate absent cells from the marginals' cross join, so the replay
  * is total. χ² ≥ Σ contribs/10⁶ compares against χ²_{(r−1)(c−1)}
  * critical values with no floats anywhere.
  *
  * Scale shape: one groupBy to the (x, y) cell grain (map-side
  * combinable), two marginal aggregates OF THE CELL RELATION (≤ r·c
  * rows), a cells-from-marginals cross join at marginal grain — data-
  * sized work is exactly one pass. Width contract: (o·n − r·c)² ≤ n⁴
  * and ×10⁶ must fit DECIMAL(38,0), so n < 10⁸ is asserted by name —
  * beyond that, χ² on raw counts is statistically meaningless anyway
  * (everything rejects); aggregate or sample first.
  *
  * Output, ordered by (x, y): (x, y, o, r_tot, c_tot, contrib_ppm,
  * chi2_ppm, dof) — the scalar statistic and degrees of freedom repeated
  * per row (the [[Concentration]] idiom).
  */
object ChiSquare {

  def independence(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val cells = df
      .select(col(xCol).cast("string").as("x"), col(yCol).cast("string").as("y"))
      .groupBy("x", "y").agg(count(lit(1)).as("o"))
    val rows = cells.groupBy("x").agg(sum("o").as("r_tot"))
    val cols = cells.groupBy("y").agg(sum("o").as("c_tot"))
    val nRow = cells.agg(sum("o").as("n"), count(lit(1)).as("filled")).head()
    val n = nRow.getLong(0)
    require(n > 0, "ChiSquare.independence: no rows")
    require(n < 100000000L,
      s"ChiSquare.independence width contract: n must be < 1e8, got $n — " +
        "aggregate or sample before testing")
    // total table: every (row, col) pair, absent cells at o = 0 — the
    // cross join runs at MARGINAL grain (r×c), never data grain
    val full = rows.crossJoin(cols)
      .join(cells, Seq("x", "y"), "left")
      .select(col("x"), col("y"), coalesce(col("o"), lit(0L)).as("o"),
        col("r_tot"), col("c_tot"))
      .withColumn("contrib_ppm", expr(
        s"""(1000000 * (CAST(o AS DECIMAL(38,0)) * ${n}L
            |            - CAST(r_tot AS DECIMAL(38,0)) * c_tot)
            |          * (CAST(o AS DECIMAL(38,0)) * ${n}L
            |            - CAST(r_tot AS DECIMAL(38,0)) * c_tot))
            |div (CAST(r_tot AS DECIMAL(38,0)) * c_tot * ${n}L)""".stripMargin))
    val tot = full.agg(
      sum("contrib_ppm").cast("long").as("chi2_ppm"),
      ((count_distinct(col("x")) - 1) * (count_distinct(col("y")) - 1))
        .as("dof"))
    full
      .crossJoin(broadcast(tot))
      .select("x", "y", "o", "r_tot", "c_tot", "contrib_ppm", "chi2_ppm", "dof")
  }
}
