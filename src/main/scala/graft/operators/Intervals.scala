package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Interval-union measure per key (gaps-and-islands): total time covered
  * by a key's possibly-overlapping intervals, the island count, and the
  * largest gap — "how many distinct sessions, how much actual watch
  * time" questions where summing raw durations double-counts overlaps.
  *
  * Islands form by the classic running-max sweep: intervals sorted by
  * (start, end) chain while each start ≤ the running max end seen so
  * far; a start beyond it opens a new island. The sweep is a per-key
  * ordered window — the sessionization contract ("a key's intervals fit
  * a task", [[graft.streaming.StatefulSessionizer]]'s bound), guarded by
  * name via [[HotKeyGuard]]. Keys are independent: corpus-grain
  * parallelism across keys, never a global order.
  *
  * Empty/invalid intervals (end ≤ start) are rejected per-row by name —
  * silently clamping them would corrupt the covered measure.
  *
  * Output: (key, n_intervals, n_islands, covered, max_gap) — max_gap 0
  * for single-island keys.
  */
object Intervals {

  def unionLength(
      df: DataFrame,
      keyCol: String,
      startCol: String,
      endCol: String,
      maxIntervalsPerKey: Long = 1000000L): DataFrame = {
    val iv0 = df.select(
      col(keyCol).as("k"),
      col(startCol).cast("long").as("s"),
      col(endCol).cast("long").as("e"))
      .filter(assert_true(
        col("e") > col("s"),
        concat(lit("Intervals.unionLength: end <= start for key "),
          col("k").cast("string"))).isNull)
    val iv = HotKeyGuard(iv0, col("k"), maxIntervalsPerKey, "Intervals.unionLength")
    val ordW = Window.partitionBy("k").orderBy(col("s"), col("e"))
    val runMaxW = ordW.rowsBetween(Window.unboundedPreceding, -1)
    val withIsland = iv
      .withColumn("__pmax", max("e").over(runMaxW))
      .withColumn("__new", when(col("__pmax").isNull || col("s") > col("__pmax"), 1L).otherwise(0L))
      .withColumn("__gap",
        when(col("__new") === 1L && col("__pmax").isNotNull, col("s") - col("__pmax"))
          .otherwise(0L))
      .withColumn("island", sum("__new").over(ordW))
    withIsland
      .groupBy("k", "island")
      .agg(
        count(lit(1)).as("__n"),
        min("s").as("__is"),
        max("e").as("__ie"),
        max("__gap").as("__g"))
      .groupBy("k")
      .agg(
        sum("__n").as("n_intervals"),
        count(lit(1)).as("n_islands"),
        sum(col("__ie") - col("__is")).as("covered"),
        max("__g").as("max_gap"))
  }
}
