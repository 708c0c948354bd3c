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

  test("maxEventsPerKey guard names the contract instead of buffering a hot key") {
    import org.apache.spark.api.java.Optional
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    import StatefulSessionizer.{Evt, SessState}
    def mkState() = TestGroupState.create[SessState](
      Optional.empty[SessState](), GroupStateTimeout.NoTimeout(), 0L,
      Optional.empty[Long](), hasTimedOut = false)
    val evs = (1L to 5L).map(i => Evt(7L, i * 1000000L, i))
    val st = mkState()
    val ex = intercept[IllegalArgumentException] {
      StatefulSessionizer.updateState(10L, maxEventsPerKey = 3L)(7L, evs.iterator, st)
    }
    assert(
      ex.getMessage.contains("StatefulSessionizer") &&
        ex.getMessage.contains("maxEventsPerKey=3"),
      ex.getMessage)
    // under the bound: identical behavior
    val out = StatefulSessionizer.updateState(10L, maxEventsPerKey = 5L)(7L, evs.iterator, mkState())
    val base = StatefulSessionizer.updateState(10L)(7L, evs.iterator, mkState())
    assert(out == base)
  }
}
