package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multi-touch attribution — distribute each conversion's credit across
  * the touch events that preceded it inside a lookback window, in EXACT
  * basis points (Σ credit per conversion = 10000, an invariant the spec
  * pins; floor-division remainders assign deterministically to the
  * EARLIEST touches, so no float ever appears and the oracle replays
  * every credit).
  *
  * Models:
  *   - `linear`: 10000 div k each, remainder to the earliest touches.
  *   - `u`: 40 % first + 40 % last + 20 % split across middles (k = 1 →
  *     10000; k = 2 → 5000/5000; middles get 2000 div (k−2) + remainder
  *     to the earliest middles) — the "position-based" industry model.
  *
  * Assignment: each touch attributes to the NEXT conversion of the same
  * user within `windowUs` (the standard last-ownership rule — a touch
  * never splits across conversions). Implemented windowed, not joined:
  * one user-partitioned sort assigns `next conversion ts` by a reversed
  * running min, so there is NO range join and NO pair explosion — at
  * 100 TB this is one hash exchange on user plus per-user sorts, the
  * same shape as sessionization. Users hash-partition evenly; a
  * celebrity user costs one task its own sort, never a shuffle storm.
  *
  * Output: (userCol, conv_tus, conv_id, event_id, touch_rank, n_touches,
  * credit_bp) — one row per attributed touch.
  */
object Attribution {

  def multiTouch(
      events: DataFrame,
      userCol: String,
      tsUsCol: String,
      idCol: String,
      typeCol: String,
      touchTypes: Seq[String],
      convType: String,
      windowUs: Long,
      model: String = "linear",
      maxEventsPerKey: Long = Long.MaxValue): DataFrame = {
    require(touchTypes.nonEmpty, "at least one touch type")
    require(windowUs > 0, s"windowUs must be positive: $windowUs")
    require(Set("linear", "u")(model), s"unknown model: $model")
    // a finite maxEventsPerKey arms the HotKeyGuard: a celebrity user
    // fails the job with this contract's name instead of an executor OOM
    // inside the per-user window sort
    val relevant = HotKeyGuard(
      events
        .filter(col(typeCol).isInCollection(touchTypes :+ convType))
        .select(
          col(userCol), col(tsUsCol).cast("long").as("__tus"),
          col(idCol).cast("long").as("__id"), col(typeCol).as("__ty")),
      col(userCol), maxEventsPerKey, "Attribution.multiTouch")
    // next conversion at-or-after each row (ties: a touch and a
    // conversion at the same µs attribute together — ordered by ts then
    // id, the conversion's own row marks the boundary)
    val wFwd = Window.partitionBy(userCol).orderBy(col("__tus").desc, col("__id").desc)
    val assigned = relevant
      .withColumn(
        "__conv",
        min(when(col("__ty") === convType, struct(col("__tus"), col("__id"))))
          .over(wFwd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .filter(
        col("__ty") =!= convType &&
          col("__conv").isNotNull &&
          col("__conv.__tus") - col("__tus") <= windowUs)
      .select(
        col(userCol),
        col("__conv.__tus").as("conv_tus"),
        col("__conv.__id").as("conv_id"),
        col("__id").as("event_id"),
        col("__tus"))
    val wRank = Window.partitionBy(col(userCol), col("conv_tus"), col("conv_id"))
      .orderBy(col("__tus"), col("event_id"))
    val ranked = assigned
      .withColumn("touch_rank", row_number().over(wRank).cast("long"))
      .withColumn(
        "n_touches",
        count(lit(1)).over(
          Window.partitionBy(col(userCol), col("conv_tus"), col("conv_id"))).cast("long"))
    val k = col("n_touches")
    val r = col("touch_rank")
    val credit = model match {
      case "linear" =>
        expr("10000 div n_touches") +
          when(r <= expr("10000 % n_touches"), 1L).otherwise(0L)
      case "u" =>
        when(k === 1L, lit(10000L))
          .when(k === 2L, lit(5000L))
          .when(r === 1L, lit(4000L))
          .when(r === k, lit(4000L))
          .otherwise(
            expr("2000 div (n_touches - 2)") +
              when(r - 1L <= expr("2000 % (n_touches - 2)"), 1L).otherwise(0L))
    }
    ranked.select(
      col(userCol), col("conv_tus"), col("conv_id"), col("event_id"),
      col("touch_rank"), col("n_touches"), credit.as("credit_bp"))
  }
}
