package graft

import graft.operators.GiniStump

class GiniStumpSpec extends SparkSpec {
  init()
  import spark.implicits._

  private def brute(rows: Seq[(Long, Long)]): Seq[(Long, Long, Long, Long)] = {
    val n = BigInt(rows.size)
    val p = BigInt(rows.map(_._2).sum)
    rows.map(_._1).distinct.sorted.flatMap { v =>
      val left = rows.filter(_._1 <= v)
      val nl = BigInt(left.size)
      val pl = BigInt(left.map(_._2).sum)
      if (nl == n) None
      else {
        val nr = n - nl
        val pr = p - pl
        val g = (BigInt(2000000) * (pl * (nl - pl) * nr + pr * (nr - pr) * nl)) /
          (nl * nr * n)
        Some((v, nl.toLong, pl.toLong, g.toLong))
      }
    }
  }

  test("perfectly separable feature: the separating split has gini 0") {
    val rows = (0L until 40L).map(i => (i, if (i < 20) 0L else 1L))
    val got = GiniStump.splits(rows.toDF("x", "y"), "x", "y")
      .orderBy("v").as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == brute(rows))
    assert(got.find(_._1 == 19L).get._4 == 0L)
    assert(got.filter(_._1 != 19L).forall(_._4 > 0L))
  }

  test("matches the BigInt replay on an interleaved fixture") {
    val rows = (0 until 300).map(i => ((i % 23).toLong, (if ((i * 7) % 3 == 0) 1 else 0).toLong))
    val got = GiniStump.splits(rows.toDF("x", "y"), "x", "y")
      .orderBy("v").as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == brute(rows))
    assert(got.size == 22) // 23 distinct values, last has empty right side
  }

  test("deterministic under repartition and duplicate-heavy values") {
    val rows = (0 until 500).map(i => ((i % 5).toLong, (i % 2).toLong))
    val df = rows.toDF("x", "y")
    val a = GiniStump.splits(df, "x", "y").orderBy("v").collect().toSeq
    val b = GiniStump.splits(df.repartition(17), "x", "y").orderBy("v").collect().toSeq
    assert(a == b && a.size == 4)
  }

  test("contract violations fail by name") {
    val neg = Seq((-1L, 1L)).toDF("x", "y")
    val exN = intercept[Exception] { GiniStump.splits(neg, "x", "y").collect() }
    assert(exN.getMessage.contains("feature values must be >= 0")
      || exN.getCause != null && exN.getCause.getMessage.contains("feature values must be >= 0"))
    val badY = Seq((1L, 5L)).toDF("x", "y")
    val exY = intercept[Exception] { GiniStump.splits(badY, "x", "y").collect() }
    assert(exY.getMessage.contains("label must be 0 or 1")
      || exY.getCause != null && exY.getCause.getMessage.contains("label must be 0 or 1"))
  }
}
