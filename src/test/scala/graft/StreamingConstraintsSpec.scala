package graft

import org.apache.spark.sql.functions._

import graft.streaming.StreamingConstraints

class StreamingConstraintsSpec extends SparkSpec {
  init()

  import spark.implicits._

  test("NULL-producing predicates FAIL the check (batch Constraints semantics)") {
    // cents NULL on two rows: `cents < 100` is NULL there — it must count
    // as a failure, not blow up the Seq[Boolean] encoder
    val rows = Seq(
      (1L, 1L, Some(50L)), (2L, 2L, None), (3L, 3L, Some(40L)),
      (4L, 4L, None), (5L, 5L, Some(999L)), (6L, 6L, Some(10L))
    ).toDF("user_id", "tus", "cents")
    val got = StreamingConstraints.run(
      rows, "user_id", "tus",
      flagChecks = Seq("cents_small" -> (col("cents") < 100L)),
      minBp = Map("cents_small" -> 5000L, "cumulative_unique" -> 100L),
      chunks = 2)
    val m = got.as[(Int, String, Long, Long, Boolean)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    // batch 0: rows 1-3 (one NULL) -> 2/3 pass; batch 1: rows 4-6 (one
    // NULL, one over) -> 1/3 pass — exact basis points, NULL = fail
    assert(m((0, "cents_small")) == 2L * 10000L / 3L, m.toString)
    assert(m((1, "cents_small")) == 1L * 10000L / 3L, m.toString)
  }

  test("LIVE rate stream: per-batch verdicts arrive with telemetry points") {
    import graft.streaming.Sources
    val (points, detach) = Sources.attachMetricsListener(spark)
    try {
      val stream = Sources.rateUnion(spark, sources = 2, rowsPerSecond = 200)
      val got = StreamingConstraints.runLive(
        stream,
        flagChecks = Seq(
          "even_value" -> (col("value") % 2 === 0),
          "ts_present" -> col("ts").isNotNull),
        minBp = Map("even_value" -> 2000L, "ts_present" -> 10000L),
        batches = 3)
        .as[(Long, String, Long, Long, Boolean)].collect()
      val byBatch = got.groupBy(_._1)
      assert(byBatch.size >= 3, s"want >= 3 reporting batches, got ${byBatch.size}")
      // one verdict row per check per batch, exact-bp invariants hold
      byBatch.foreach { case (b, rows) =>
        assert(rows.map(_._2).toSet == Set("even_value", "ts_present"), s"batch $b")
        rows.foreach { case (_, check, bp, thr, pass) =>
          assert(bp >= 0 && bp <= 10000, s"$check bp=$bp")
          assert(pass == (bp >= thr), s"$check verdict must be bp >= threshold")
          if (check == "ts_present") assert(bp == 10000L, "rate rows always carry ts")
        }
      }
      // telemetry points accompany the verdicts: the listener saw at least
      // as many non-trivial batches as reported verdicts
      import scala.jdk.CollectionConverters._
      val deadline = System.nanoTime() + 10000000000L
      while (points.asScala.count(_.inputRows > 0) < byBatch.size - 1 &&
        System.nanoTime() < deadline)
        Thread.sleep(50)
      val pts = points.asScala.toSeq
      // the listener fires asynchronously and the stop() can race the LAST
      // batch's progress event — all but one verdict batch must have a
      // telemetry point, and every point carries throughput/duration
      assert(pts.count(_.inputRows > 0) >= byBatch.size - 1,
        s"telemetry points ${pts.size} must cover the ${byBatch.size} verdict batches")
      pts.filter(_.inputRows > 0).foreach { p =>
        assert(p.durationMs >= 0 && p.processedRowsPerSecond >= 0, p.toString)
      }
    } finally detach()
  }
}
