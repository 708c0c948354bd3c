package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Difference-in-differences — the quasi-experimental workhorse (Card &
  * Krueger 1994): when treatment wasn't randomized, the effect estimate
  * is the TREATED group's pre→post change minus the CONTROL group's,
  * which nets out any shared trend:
  *   did_ppm = (ȳ_T,post − ȳ_T,pre) − (ȳ_C,post − ȳ_C,pre),
  * each cell mean floored in ppm (engine-exact; the four floors are part
  * of the estimator's definition here). The companion [[Cuped]] handles
  * the randomized case; this one handles rollouts, policy changes, and
  * staged launches.
  *
  * Scale shape: ONE map-side-combinable groupBy to the four (arm,
  * period) cells — sufficient statistics only, no per-unit second pass.
  * Rows outside the two arm / two period labels are rejected by name so
  * a typo'd label cannot silently vanish from the estimate.
  *
  * Output: one row (n_treat_pre, n_treat_post, n_ctrl_pre, n_ctrl_post,
  * mean_treat_pre_ppm, mean_treat_post_ppm, mean_ctrl_pre_ppm,
  * mean_ctrl_post_ppm, did_ppm).
  */
object DiffInDiff {

  def estimate(
      df: DataFrame,
      armCol: String,
      periodCol: String,
      yCol: String,
      treatLabel: String,
      ctrlLabel: String,
      preLabel: String,
      postLabel: String): DataFrame = {
    require(treatLabel != ctrlLabel, "DiffInDiff.estimate: arm labels must differ")
    require(preLabel != postLabel, "DiffInDiff.estimate: period labels must differ")
    val d = df.select(
      when(col(armCol).cast("string") === treatLabel, lit(1))
        .when(col(armCol).cast("string") === ctrlLabel, lit(0))
        .otherwise(raise_error(concat(
          lit(s"DiffInDiff.estimate: arm must be '$treatLabel' or '$ctrlLabel', got "),
          col(armCol).cast("string")))).as("tr"),
      when(col(periodCol).cast("string") === preLabel, lit(0))
        .when(col(periodCol).cast("string") === postLabel, lit(1))
        .otherwise(raise_error(concat(
          lit(s"DiffInDiff.estimate: period must be '$preLabel' or '$postLabel', got "),
          col(periodCol).cast("string")))).as("post"),
      col(yCol).cast("long").cast("decimal(38,0)").as("y"))
    val cells = d.groupBy("tr", "post")
      .agg(count(lit(1)).cast("decimal(38,0)").as("n"), sum("y").as("s"))
    def cell(tr: Int, post: Int, nm: String): DataFrame =
      cells.filter(col("tr") === tr && col("post") === post)
        .select(
          col("n").cast("long").as(s"n_$nm"),
          expr("(1000000 * s) div n").as(s"mean_${nm}_ppm"))
    cell(1, 0, "treat_pre")
      .crossJoin(cell(1, 1, "treat_post"))
      .crossJoin(cell(0, 0, "ctrl_pre"))
      .crossJoin(cell(0, 1, "ctrl_post"))
      .select(
        col("n_treat_pre"), col("n_treat_post"),
        col("n_ctrl_pre"), col("n_ctrl_post"),
        col("mean_treat_pre_ppm"), col("mean_treat_post_ppm"),
        col("mean_ctrl_pre_ppm"), col("mean_ctrl_post_ppm"),
        expr(
          """(mean_treat_post_ppm - mean_treat_pre_ppm)
            |  - (mean_ctrl_post_ppm - mean_ctrl_pre_ppm)""".stripMargin)
          .as("did_ppm"))
  }
}
