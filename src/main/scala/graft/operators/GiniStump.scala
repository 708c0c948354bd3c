package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact decision-stump split scan under Gini impurity — the CART root
  * step (Breiman et al. 1984) as a relational plan: for every candidate
  * threshold v (split "x ≤ v" vs "x > v"), the weighted impurity of the
  * two sides, engine-exact, so the argmin row IS the trained stump and
  * feature-importance screens can rank columns by their best split.
  *
  * The identity that keeps it integral: a side with n rows of which p
  * positive contributes n·gini = 2·p·(n−p)/n, so
  *   gini_ppm(v) = (2·10⁶·(pL·(nL−pL)·nR + pR·(nR−pR)·nL)) div (nL·nR·n)
  * — one truncating division per threshold, DECIMAL(38,0) products
  * (width contract n < 10¹⁰ rows per stump call).
  *
  * Scale shape: ONE groupBy to (feature value) grain — candidate
  * thresholds are distinct values, never per-row — then TWO
  * [[PrefixSum.exclusive]] block-recursive passes over that grain (count
  * and positives; no global-order window ever fires) and a broadcast
  * single-row total. Cost is the histogram, not the relation.
  *
  * Input: integral non-negative `featureCol` (shift/scale upstream;
  * floats quantize to cents/ppm first), `labelCol` ∈ {0, 1}. Output:
  * (v, n_left, pos_left, gini_ppm) for every v with a non-empty right
  * side, ascending v; min(gini_ppm) is the stump.
  */
object GiniStump {

  def splits(df: DataFrame, featureCol: String, labelCol: String): DataFrame = {
    val d = df.select(
      when(col(featureCol).cast("long") < 0,
        raise_error(concat(
          lit("GiniStump.splits: feature values must be >= 0, got "),
          col(featureCol).cast("string"))).cast("long"))
        .otherwise(col(featureCol).cast("long")).as("x"),
      when(col(labelCol).cast("int").isin(0, 1), col(labelCol).cast("long"))
        .otherwise(raise_error(concat(
          lit("GiniStump.splits: label must be 0 or 1, got "),
          col(labelCol).cast("string"))).cast("long")).as("y"))
    val grain = d.groupBy("x").agg(
      count(lit(1)).as("cnt"),
      sum("y").as("pos"))
    val beforeCnt = PrefixSum.exclusive(grain.select(col("x").as("k"), col("cnt").as("s")))
      .select(col("k").as("x"), col("before").as("cnt_before"))
    val beforePos = PrefixSum.exclusive(grain.select(col("x").as("k"), col("pos").as("s")))
      .select(col("k").as("x"), col("before").as("pos_before"))
    val tot = grain.agg(
      sum("cnt").cast("decimal(38,0)").as("n"),
      sum("pos").cast("decimal(38,0)").as("p"))
    grain
      .join(beforeCnt, "x")
      .join(beforePos, "x")
      .crossJoin(broadcast(tot))
      .withColumn("nl", expr("CAST(cnt_before + cnt AS DECIMAL(38,0))"))
      .withColumn("pl", expr("CAST(pos_before + pos AS DECIMAL(38,0))"))
      .filter(col("nl") < col("n"))
      .select(
        col("x").as("v"),
        col("nl").cast("long").as("n_left"),
        col("pl").cast("long").as("pos_left"),
        expr(
          """(2000000 * (pl * (nl - pl) * (n - nl)
            |            + (p - pl) * ((n - nl) - (p - pl)) * nl))
            |  div (nl * (n - nl) * n)""".stripMargin).as("gini_ppm"))
  }
}
