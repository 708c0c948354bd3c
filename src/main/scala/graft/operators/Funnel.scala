package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordered-step funnel analysis: for each user, the earliest
  * strictly-ordered completion of a step sequence within a time window of
  * the first step — "signed up, then viewed, then clicked, then purchased
  * within a week" — the conversion query every event pipeline answers.
  *
  * Semantics: t₁ = min time of step 1; tᵢ = min time of step i with
  * tᵢ > tᵢ₋₁ and tᵢ ≤ t₁ + window. Earliest-completion greedy is the
  * standard funnel definition and is ORDER-SAFE: each tᵢ is a plain MIN
  * over a predicate of already-fixed scalars, so the result is exact
  * integer arithmetic in the microsecond domain — no window functions
  * over full event history, no per-user sort.
  *
  * Scale shape: one aggregation per step, each a map-side-combined
  * groupBy(user) MIN over a type-filtered scan slice, stitched with
  * user-keyed joins that reuse the same hash partitioning (AQE plans
  * them shuffle-free after the first agg). Funnel depth k = k scans of
  * the (type-pruned) events — each slice read is ~1/|types| of the data;
  * at 100 TB the type filter pushes into the scan.
  */
object Funnel {

  /** Per-user funnel times: (userCol, reached, t1 .. tk) with −1 for
    * steps not reached. `tsUsCol` must be a LONG microsecond column.
    */
  def analyze(
      events: DataFrame,
      userCol: String,
      tsUsCol: String,
      typeCol: String,
      steps: Seq[String],
      windowUs: Long): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(windowUs > 0, s"windowUs must be positive: $windowUs")
    var cur = events
      .filter(col(typeCol) === steps.head)
      .groupBy(col(userCol))
      .agg(min(col(tsUsCol)).as("t1"))
    steps.zipWithIndex.drop(1).foreach { case (step, i) =>
      val prev = s"t$i"
      val name = s"t${i + 1}"
      val nxt = events
        .filter(col(typeCol) === step)
        .select(col(userCol), col(tsUsCol).as("__ts"))
        .join(cur.select(col(userCol), col(prev), col("t1").as("__t1")), userCol)
        .filter(col("__ts") > col(prev) && col("__ts") <= col("__t1") + windowUs)
        .groupBy(col(userCol))
        .agg(min(col("__ts")).as(name))
      cur = cur.join(nxt, Seq(userCol), "left")
    }
    val tCols = (1 to steps.size).map(i => s"t$i")
    cur.select(
      col(userCol) +:
        tCols.map(c => coalesce(col(c), lit(-1L)).as(c)) :+
        tCols.map(c => when(col(c).isNotNull, 1).otherwise(0))
          .reduce(_ + _).cast("long").as("reached"): _*)
  }
}
