package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Named-contract guard for per-key buffering operators ([[EventPattern]],
  * [[Attribution]], [[graft.streaming.StatefulSessionizer]]): they build a
  * key's events inside one task under the sessionization contract ("a
  * key's events fit a task"). At 100 TB a single celebrity key would
  * otherwise surface as a mystery executor OOM mid-aggregation; this guard
  * turns that into a job failure that CARRIES THE CONTRACT'S NAME and the
  * offending key/count, so the operator fails the way its scaladoc says it
  * can.
  *
  * Shape: one extra map-side-combinable count aggregation over the same
  * (already projected) rows, reduced to a single row the guarded plan
  * broadcast-cross-joins — no driver action, no second shuffle of the
  * data, output schema untouched. The filter on the guard column keeps
  * Catalyst from pruning the probe's `assert_true` away. Opt-in via a
  * finite `maxEventsPerKey`; `Long.MaxValue` (the default everywhere)
  * is a no-op.
  */
object HotKeyGuard {

  def apply(
      df: DataFrame,
      keyCol: Column,
      maxEventsPerKey: Long,
      contract: String): DataFrame = {
    if (maxEventsPerKey == Long.MaxValue) df
    else {
      require(maxEventsPerKey > 0, s"maxEventsPerKey must be positive: $maxEventsPerKey")
      val probe = df
        .groupBy(keyCol.as("__gk"))
        .agg(count(lit(1)).as("__gn"))
        .agg(count(assert_true(
          col("__gn") <= lit(maxEventsPerKey),
          concat(
            lit(s"$contract: maxEventsPerKey=$maxEventsPerKey contract violated by key "),
            col("__gk").cast("string"),
            lit(" with "),
            col("__gn").cast("string"),
            lit(" events")))).as("__guard"))
      df.crossJoin(broadcast(probe))
        .filter(col("__guard") >= 0L)
        .drop("__guard")
    }
  }
}
