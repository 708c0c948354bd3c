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
  * a typo'd label cannot silently vanish from the estimate, and an EMPTY
  * (arm, period) cell is rejected by name too — the estimator needs all
  * four cells, and a missing one must fail loudly, not return no rows.
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
    // one conditional single-row aggregate instead of four filter +
    // crossJoins: an empty (arm, period) cell surfaces as NULL and is
    // rejected BY NAME — the same loud-failure contract as the label
    // checks above — where the crossJoin form would silently evaporate
    // the whole estimate into an empty DataFrame
    val names = Seq(
      (1, 0, "treat_pre"), (1, 1, "treat_post"),
      (0, 0, "ctrl_pre"), (0, 1, "ctrl_post"))
    val flatAggs = names.flatMap { case (tr, post, nm) =>
      val hit = col("tr") === tr && col("post") === post
      Seq(max(when(hit, col("n"))).as(s"__n_$nm"),
        max(when(hit, col("s"))).as(s"__s_$nm"))
    }
    val armOf = Map(1 -> treatLabel, 0 -> ctrlLabel)
    val perOf = Map(0 -> preLabel, 1 -> postLabel)
    val checked = names.foldLeft(cells.agg(flatAggs.head, flatAggs.tail: _*)) {
      case (acc, (tr, post, nm)) =>
        acc.withColumn(s"__n_$nm",
          when(col(s"__n_$nm").isNull,
            raise_error(lit(
              s"DiffInDiff.estimate: zero rows in the (arm '${armOf(tr)}', " +
                s"period '${perOf(post)}') cell — all four cells must be " +
                "non-empty")).cast("decimal(38,0)"))
            .otherwise(col(s"__n_$nm")))
    }
    checked
      .select(names.flatMap { case (_, _, nm) =>
        Seq(
          col(s"__n_$nm").cast("long").as(s"n_$nm"),
          expr(s"(1000000 * __s_$nm) div __n_$nm").as(s"mean_${nm}_ppm"))
      }: _*)
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
