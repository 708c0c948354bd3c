package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Leave-one-out target encoding — the high-cardinality categorical
  * feature trick (Micci-Barreca 2001): replace a category with the mean
  * label of the OTHER rows sharing it, enc = (Σy_cat − y_row)/(n_cat − 1),
  * so a row never sees its own label (the leakage that makes naive mean
  * encoding overfit instantly). Singleton categories fall back to the
  * global prior — the same value an unseen category gets at serving
  * time. Everything floors in ppm (engine-exact): enc_ppm =
  * (10⁶·(Σy − y)) div (n − 1), prior_ppm = (10⁶·Σy_all) div n_all.
  *
  * Scale shape: ONE map-side-combinable groupBy to category grain, one
  * global single-row aggregate, and a category-stats join back to rows
  * — the stats relation is |categories|-sized (broadcast when small,
  * shuffle-join when categorical cardinality is data-like; Spark picks
  * by size). No window, no per-row state.
  *
  * Output: input id/category/label plus enc_ppm, one row per input row.
  */
object TargetEncoding {

  def leaveOneOut(
      df: DataFrame,
      idCol: String,
      categoryCol: String,
      labelCol: String): DataFrame = {
    val d = df.select(
      col(idCol).as("id"),
      col(categoryCol).cast("string").as("category"),
      when(col(labelCol).cast("int").isin(0, 1), col(labelCol).cast("long"))
        .otherwise(raise_error(concat(
          lit("TargetEncoding.leaveOneOut: label must be 0 or 1, got "),
          col(labelCol).cast("string"))).cast("long")).as("y"))
    val stats = d.groupBy("category")
      .agg(count(lit(1)).as("n_cat"), sum("y").as("sum_cat"))
    // label sums widen to DECIMAL(38,0) before the 10^6 scaling (a plain
    // BIGINT product overflows once a category's Σy exceeds ~9.2·10^12);
    // `div` on decimals returns BIGINT and the ppm result is ≤ 10^6
    val prior = d.agg(
      expr("(1000000 * CAST(sum(y) AS DECIMAL(38,0))) div count(1)")
        .as("prior_ppm"))
    d.join(stats, "category")
      .crossJoin(broadcast(prior))
      .select(
        col("id"),
        col("category"),
        col("y"),
        expr(
          """CASE WHEN n_cat <= 1 THEN prior_ppm
            |ELSE (1000000 * (CAST(sum_cat AS DECIMAL(38,0)) - y))
            |     div (n_cat - 1) END""".stripMargin)
          .as("enc_ppm"))
  }
}
