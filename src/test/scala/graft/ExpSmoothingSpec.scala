package graft

import graft.operators.ExpSmoothing

class ExpSmoothingSpec extends SparkSpec {
  init()
  import spark.implicits._

  private def brute(xs: Seq[Long], k: Int): Seq[(Long, Long, Long)] = {
    val scale = 1L << k
    var level = xs.head * scale
    xs.zipWithIndex.map { case (x, i) =>
      val fc = if (i == 0) x * scale else level
      level = level + (x * scale - level) / scale
      (fc, x * scale - fc, level)
    }
  }

  private def run(xs: Seq[Long], k: Int): Seq[(Long, Long, Long, Long, Long)] =
    ExpSmoothing.ema(
        xs.zipWithIndex.map { case (x, t) => ("a", t.toLong, x) }.toDF("k", "t", "x"),
        "k", "t", "x", kLog2 = k)
      .orderBy("t").as[(String, Long, Long, Long, Long, Long)].collect()
      .map(r => (r._2, r._3, r._4, r._5, r._6)).toSeq

  test("matches the sequential recursion; level converges toward a constant series") {
    val xs = Seq(0L, 0L, 0L, 64L, 64L, 64L, 64L, 64L, 64L, 64L)
    val got = run(xs, k = 2)
    val want = brute(xs, 2)
    assert(got.map(r => (r._3, r._4, r._5)) == want)
    // alpha = 1/4: level climbs toward 64*4 = 256 after the shift
    assert(got.last._5 > 200L && got.last._5 <= 256L)
    // first bucket forecasts itself with zero error
    assert(got.head._3 == 0L && got.head._4 == 0L)
  }

  test("one-step-ahead honesty: row t's forecast is the level after row t-1") {
    val xs = (0 until 40).map(i => ((i * 13) % 29).toLong)
    val got = run(xs, k = 3)
    got.sliding(2).foreach { case Seq(prev, cur) =>
      assert(cur._3 == prev._5, s"t=${cur._1}")
    }
    assert(got.map(r => (r._3, r._4, r._5)) == brute(xs, 3))
  }

  test("keys are independent; pre-grain duplicates sum; deterministic under repartition") {
    val rows = (0 until 300).map(i => ("k" + i % 3, (i % 20).toLong, (i % 7).toLong))
    val df = rows.toDF("k", "t", "x")
    val a = ExpSmoothing.ema(df, "k", "t", "x", 2).orderBy("k", "t").collect().toSeq
    val b = ExpSmoothing.ema(df.repartition(11), "k", "t", "x", 2)
      .orderBy("k", "t").collect().toSeq
    assert(a == b)
    // per-key brute replay on the summed grain
    rows.groupBy(_._1).foreach { case (key, rs) =>
      val series = rs.groupBy(_._2).view.mapValues(_.map(_._3).sum).toSeq.sortBy(_._1)
      val want = brute(series.map(_._2), 2)
      val mine = a.filter(_.getString(0) == key)
        .map(r => (r.getLong(3), r.getLong(4), r.getLong(5)))
      assert(mine == want, key)
    }
  }
}
