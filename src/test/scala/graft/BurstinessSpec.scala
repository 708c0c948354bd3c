package graft

import graft.operators.Burstiness

class BurstinessSpec extends SparkSpec {
  init()
  import spark.implicits._

  private def run(rows: Seq[(String, Long)]): Map[String, (Long, Long, Long)] =
    Burstiness.fano(rows.toDF("k", "b"), "k", "b")
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap

  test("perfectly regular key scores 0; one-bucket burst scores ~1e6 per event") {
    // domain = buckets 0..9 (B = 10)
    val regular = (0L until 10L).map(b => ("reg", b))
    val bursty = Seq.fill(10)(("burst", 0L)) ++ Seq(("pin", 9L))
    val got = run(regular ++ bursty)
    assert(got("reg") == ((10L, 10L, 0L))) // c=1 everywhere: variance 0
    // burst: S=10, SS=100, B=10 -> (10*100-100)/(10*10) = 9 -> 9e6 ppm
    assert(got("burst") == ((10L, 1L, 9000000L)))
    // pin: single event: S=1, SS=1 -> (10-1)/10 -> 900000 ppm
    assert(got("pin") == ((1L, 1L, 900000L)))
  }

  test("matches the zero-filled variance/mean definition on a mixed fixture") {
    val rows = (0 until 300).map(i => ("k" + i % 5, ((i * 7) % 23).toLong))
    val bMin = rows.map(_._2).min
    val bMax = rows.map(_._2).max
    val bb = BigInt(bMax - bMin + 1)
    val got = run(rows)
    rows.groupBy(_._1).foreach { case (k, rs) =>
      val counts = rs.groupBy(_._2).map(_._2.size.toLong)
      val s = BigInt(counts.sum)
      val ss = counts.map(c => BigInt(c) * c).sum
      val want = (BigInt(1000000) * (bb * ss - s * s)) / (bb * s)
      assert(got(k) == ((s.toLong, counts.size.toLong, want.toLong)), k)
    }
  }

  test("deterministic under repartition") {
    val rows = (0 until 400).map(i => ("k" + i % 7, ((i * 13) % 31).toLong))
    val df = rows.toDF("k", "b")
    val a = Burstiness.fano(df, "k", "b").orderBy("k").collect().toSeq
    val b = Burstiness.fano(df.repartition(11), "k", "b").orderBy("k").collect().toSeq
    assert(a == b)
  }
}
