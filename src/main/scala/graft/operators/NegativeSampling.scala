package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic negative sampling for implicit-feedback training — the
  * recsys data-prep step: for every user, k items they did NOT interact
  * with, drawn (pseudo-)uniformly from a dense item space [1, numItems]
  * WITHOUT materializing the user × item complement (which is the whole
  * point at 10⁹ users × 10⁸ items). Proposals are hash-draws
  * item(u, j) = (md5⁸(u:j) mod numItems) + 1 for j < oversample·k —
  * the [[Sampling]] md5 determinism discipline, so the sample is
  * reproducible, mergeable across reruns, and SQL-replayable — then one
  * anti-join removes true interactions, per-user duplicates keep their
  * smallest draw index, and the k lowest surviving indices win.
  *
  * Scale shape: proposals are users × oversample·k rows (an explode off
  * the DISTINCT-user relation, never off interactions), one anti-join
  * on (user, item), one per-USER window over ≤ oversample·k rows. A
  * user who interacted with nearly everything may yield fewer than k
  * negatives at the chosen oversample — undersupply is visible in the
  * output (count < k), not silently padded.
  *
  * Output: (user, item, draw) — draw the winning proposal index,
  * ≤ k rows per user, ascending draw.
  */
object NegativeSampling {

  def sample(
      interactions: DataFrame,
      userCol: String,
      itemCol: String,
      numItems: Long,
      k: Int,
      oversample: Int = 4): DataFrame = {
    require(numItems >= 1, s"NegativeSampling.sample: numItems >= 1, got $numItems")
    require(k >= 1, s"NegativeSampling.sample: k >= 1, got $k")
    require(oversample >= 2, s"NegativeSampling.sample: oversample >= 2, got $oversample")
    val m = oversample.toLong * k
    val inter = interactions.select(
      col(userCol).cast("long").as("user"),
      col(itemCol).cast("long").as("item")).distinct()
    val users = inter.select("user").distinct()
    val proposals = users
      .select(col("user"), explode(sequence(lit(0L), lit(m - 1L))).as("draw"))
      .withColumn("item",
        pmod(
          conv(substring(md5(concat_ws(":", col("user"), col("draw"))), 1, 8), 16, 10)
            .cast("long"),
          lit(numItems)) + lit(1L))
    val negatives = proposals
      .join(inter, Seq("user", "item"), "left_anti")
      .groupBy("user", "item")
      .agg(min("draw").as("draw"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user").orderBy("draw")
    negatives
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= k)
      .drop("__rk")
  }
}
