package graft

import graft.operators.{ChangePoint, PrefixSum}

class ChangePointSpec extends SparkSpec {
  init()
  import spark.implicits._

  private def bruteCusum(xs: Seq[Long], ref: Long): Seq[Long] = {
    var s = 0L
    xs.map { x => s = math.max(0L, s + x - ref); s }
  }

  test("matches the sequential recursion on a shifted series") {
    // level 10 for 30 buckets, then level 14: CUSUM ramps after the shift
    val xs = (0 until 30).map(_ => 10L) ++ (0 until 20).map(_ => 14L)
    val df = xs.zipWithIndex.map { case (x, i) => (i.toLong, x) }.toDF("t", "x")
    val got = ChangePoint.cusum(df, "t", "x", ref = 11L, h = 20L)
      .orderBy("t").as[(Long, Long, Long, Boolean)].collect().toSeq
    val want = bruteCusum(xs, 11L)
    assert(got.map(_._3) == want)
    assert(got.map(_._4) == want.map(_ > 20L))
    // pre-shift the statistic stays pinned at 0; post-shift it ramps by 3/bucket
    assert(got.take(30).forall(_._3 == 0L))
    assert(got.last._3 == 60L && got.last._4)
  }

  test("negative drifts clamp at zero and recover") {
    val xs = Seq(5L, 20L, 2L, 2L, 20L)
    val df = xs.zipWithIndex.map { case (x, i) => (i.toLong, x) }.toDF("t", "x")
    val got = ChangePoint.cusum(df, "t", "x", ref = 10L, h = 100L)
      .orderBy("t").as[(Long, Long, Long, Boolean)].collect().toSeq
    assert(got.map(_._3) == bruteCusum(xs, 10L))
  }

  test("pre-grain duplicates sum into their bucket") {
    val df = Seq((0L, 3L), (0L, 4L), (1L, 10L)).toDF("t", "x")
    val got = ChangePoint.cusum(df, "t", "x", ref = 5L, h = 1L)
      .orderBy("t").as[(Long, Long, Long, Boolean)].collect().toSeq
    assert(got == Seq((0L, 7L, 2L, true), (1L, 10L, 7L, true)))
  }

  test("deterministic under repartition and across the block-recursion boundary") {
    val xs = (0 until 9000).map(i => (i.toLong, ((i * 31) % 23).toLong))
    val df = xs.toDF("t", "x")
    val a = ChangePoint.cusum(df, "t", "x", 11L, 50L).orderBy("t").collect().toSeq
    val b = ChangePoint.cusum(df.repartition(21), "t", "x", 11L, 50L)
      .orderBy("t").collect().toSeq
    assert(a == b)
    assert(a.map(r => r.getLong(2)) == bruteCusum(xs.map(_._2), 11L))
  }

  test("mean-ref form calibrates ref and h from the series itself") {
    // sum = 20*10 + 10*22 = 420 over 30 buckets -> ref = 14, h = (2*14) div 1 = 28
    val xs = (0 until 20).map(_ => 10L) ++ (0 until 10).map(_ => 22L)
    val df = xs.zipWithIndex.map { case (x, i) => (i.toLong, x) }.toDF("t", "x")
    val got = ChangePoint.cusumMeanRef(df, "t", "x", hNum = 2L, hDen = 1L)
      .orderBy("t").as[(Long, Long, Long, Boolean)].collect().toSeq
    val want = bruteCusum(xs, 14L)
    assert(got.map(_._3) == want)
    assert(got.map(_._4) == want.map(_ > 28L))
    assert(got.exists(_._4)) // the level shift does alarm
  }

  test("exclusiveMin scan: block recursion equals the sequential min") {
    val kv = (0 until 9000).map(i => (i.toLong, ((i * 37) % 101 - 50).toLong))
    val got = PrefixSum.exclusiveMin(kv.toDF("k", "s"), blockSize = 64)
      .orderBy("k").as[(Long, Option[Long])].collect().toSeq
    var best: Option[Long] = None
    val want = kv.map { case (k, s) =>
      val r = (k, best)
      best = Some(best.fold(s)(math.min(_, s)))
      r
    }
    assert(got == want)
  }
}
