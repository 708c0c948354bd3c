package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.streaming.{SemiStreamRuntime, StatefulSessionizer}

class StatefulSessionizerSpec extends SparkSpec {
  init()

  test("stateful streaming sessionization equals the batch lag-window sessionizer") {
    val ev = Tables(spark, sfSmoke, "events")
      .select("user_id", "ts", "event_id")

    // time-ordered chunks: cross-batch state only works if batches respect
    // event-time order (the reference's stream is time-ordered too)
    val stats = ev.agg(
      min(col("ts").cast("long")).as("mn"), max(col("ts").cast("long")).as("mx")).head()
    val (mn, mx) = (stats.getLong(0), stats.getLong(1))
    val n = 4
    val chunked = ev.withColumn(
      "chunk",
      least(
        lit(n - 1),
        (((col("ts").cast("long") - mn) * n) / (mx - mn + 1)).cast("int")))
    val staged = SemiStreamRuntime.stageByColumn(chunked, "chunk", n)

    val got = StatefulSessionizer.run(spark, staged, ev.schema, gapSeconds = 1800)

    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val expected = ev
      .withColumn("gap_s", col("ts").cast("long") - lag(col("ts"), 1).over(w).cast("long"))
      .withColumn("brk", when(col("gap_s").isNull || col("gap_s") > 1800, 1).otherwise(0))
      .groupBy("user_id")
      .agg(sum("brk").as("n_sessions"))

    assert(got.count() == expected.count())
    assert(got.exceptAll(expected).isEmpty && expected.exceptAll(got).isEmpty)
  }
}
