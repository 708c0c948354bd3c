package graft

import graft.operators.ChangePoint
import graft.streaming.StreamingCusum

class StreamingCusumSpec extends SparkSpec {
  init()
  import spark.implicits._

  // 20 daily buckets, two rows each; level 10 through bucket 9, then 25:
  // the shift lands in chunk 2 of 4 (seq = bucket -> 5 buckets per chunk)
  private val rows: Seq[(Long, Long, Long)] =
    (0L until 20L).flatMap { b =>
      val (x1, x2) = if (b < 10) (5L, 5L) else (12L, 13L)
      Seq((b, b, x1), (b, b, x2))
    }

  private def brute: Seq[(Int, Long, Long, Long, Boolean)] = {
    val totals = rows.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val ref = (0L until 5L).map(totals).sum / 5 // calibration window = chunk 0
    val h = ref / 2
    (0 until 4).flatMap { b =>
      val buckets = (0L until 20L).filter(_ / 5 <= b).sorted
      var s = 0L
      buckets.map { t =>
        s = math.max(0L, s + totals(t) - ref)
        (b, t, totals(t), s, s > h)
      }
    }
  }

  test("per-batch snapshots replay the sequential recursion; the shift alarms mid-stream") {
    val got = StreamingCusum.run(rows.toDF("bucket", "seq", "x"),
        "bucket", "seq", "x", refNum = 1L, refDen = 1L, hNum = 1L, hDen = 2L, chunks = 4)
      .orderBy("batch", "t").as[(Int, Long, Long, Long, Boolean)].collect().toSeq
    assert(got == brute)
    // batch 1 (all level-10 data) never alarms; batch 2 onward does
    assert(got.filter(_._1 == 1).forall(!_._5))
    assert(got.filter(_._1 == 2).exists(_._5))
  }

  test("final snapshot equals the batch operator with the calibrated ref/h") {
    val got = StreamingCusum.run(rows.toDF("bucket", "seq", "x"),
        "bucket", "seq", "x", 1L, 1L, 1L, 2L, chunks = 4)
      .filter($"batch" === 3).select("t", "x", "cusum", "alarm")
      .orderBy("t").collect().toSeq
    val batch = ChangePoint.cusum(
        rows.toDF("bucket", "seq", "x").select($"bucket", $"x"),
        "bucket", "x", ref = 10L, h = 5L)
      .orderBy("t").collect().toSeq
    assert(got == batch)
  }

}
