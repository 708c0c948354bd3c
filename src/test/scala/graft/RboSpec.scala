package graft

import graft.operators.Rbo

class RboSpec extends SparkSpec {
  init()
  import spark.implicits._

  private def run(
      x: Seq[(Long, String, Int)],
      y: Seq[(Long, String, Int)],
      k: Int,
      pNum: Long = 9L,
      pDen: Long = 10L): Map[Long, (Long, Long)] =
    Rbo.perQuery(x.toDF("q", "d", "rnk"), y.toDF("q", "d", "rnk"),
      "q", "d", "rnk", k, pNum, pDen)
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap

  private def brute(
      x: Seq[(Long, String, Int)],
      y: Seq[(Long, String, Int)],
      k: Int,
      pNum: Long,
      pDen: Long): Map[Long, (Long, Long)] = {
    val qs = (x ++ y).filter(_._3 <= k).map(_._1).distinct
    qs.map { q =>
      val xs = x.filter(r => r._1 == q && r._3 <= k).map(r => r._3 -> r._2).toMap
      val ys = y.filter(r => r._1 == q && r._3 <= k).map(r => r._3 -> r._2).toMap
      var tsum = BigInt(0)
      var matched = 0L
      for (d <- 1 to k) {
        val xd = (1 to d).flatMap(xs.get).toSet
        val yd = (1 to d).flatMap(ys.get).toSet
        val ov = BigInt((xd & yd).size)
        if (d == k) matched = ov.toLong
        val w = BigInt(pNum).pow(d - 1) * BigInt(pDen).pow(k - d)
        tsum += w * 1000000 * ov / d
      }
      val ext = BigInt(pNum).pow(k) * 1000000 * matched / k
      q -> ((matched,
        ((BigInt(pDen - pNum) * tsum + ext) / BigInt(pDen).pow(k)).toLong))
    }.toMap
  }

  test("identical rankings score exactly 1e6; disjoint score 0") {
    val x = (1 to 10).map(i => (1L, s"doc$i", i))
    assert(run(x, x, 10)(1L) == ((10L, 1000000L)))
    val y = (1 to 10).map(i => (1L, s"other$i", i))
    val got = run(x, y, 10)(1L)
    assert(got == ((0L, 0L)))
  }

  test("a rank-1 swap costs far more than a tail swap (top-weightedness)") {
    val base = (1 to 10).map(i => (1L, s"d$i", i))
    val headSwap = (1 to 10).map(i =>
      (1L, s"d${if (i == 1) 99 else i}", i)) // replace rank 1
    val tailSwap = (1 to 10).map(i =>
      (1L, s"d${if (i == 10) 99 else i}", i)) // replace rank 10
    val h = run(base, headSwap, 10)(1L)._2
    val t = run(base, tailSwap, 10)(1L)._2
    assert(h < t, s"head swap $h must cost more than tail swap $t")
    assert(brute(base, headSwap, 10, 9, 10)(1L)._2 == h)
    assert(brute(base, tailSwap, 10, 9, 10)(1L)._2 == t)
  }

  test("matches the BigInt replay on shuffled multi-query fixtures") {
    val x = for (q <- 1L to 5L; i <- 1 to 10)
      yield (q, s"d${(i * 7 + q) % 13}_$q", i)
    val y = for (q <- 1L to 5L; i <- 1 to 10)
      yield (q, s"d${(i * 3 + 2 * q) % 13}_$q", i)
    assert(run(x, y, 10) == brute(x, y, 10, 9, 10))
    assert(run(x, y, 5, 1, 2) == brute(x, y, 5, 1, 2))
  }

  test("width contract and bad p fail by name") {
    val df = Seq((1L, "d", 1)).toDF("q", "d", "rnk")
    val e = intercept[IllegalArgumentException] {
      graft.operators.Rbo.perQuery(df, df, "q", "d", "rnk", k = 40)
    }
    assert(e.getMessage.contains("width contract"))
    // round-13 ADVICE: k=26 at pDen=10 passed the old 1e37 bound but
    // overflowed the DECIMAL(38,6) '/ depth' result (~1e32 integral);
    // the tightened contract must reject it up front
    val e26 = intercept[IllegalArgumentException] {
      graft.operators.Rbo.perQuery(df, df, "q", "d", "rnk", k = 26)
    }
    assert(e26.getMessage.contains("width contract"))
    // k=24 at p=9/10 is the documented edge and must still run
    val ok = graft.operators.Rbo.perQuery(
      (1 to 24).map(i => (1L, s"d$i", i)).toDF("q", "d", "rnk"),
      (1 to 24).map(i => (1L, s"d$i", i)).toDF("q", "d", "rnk"),
      "q", "d", "rnk", k = 24)
      .as[(Long, Long, Long)].collect().head
    assert(ok == ((1L, 24L, 1000000L)), s"identical k=24 prefix must score 1e6: $ok")
    intercept[IllegalArgumentException] {
      graft.operators.Rbo.perQuery(df, df, "q", "d", "rnk", k = 5, pNum = 10, pDen = 10)
    }
  }

  test("rbo TVF round-trips the Scala path") {
    val x = for (q <- 1L to 3L; i <- 1 to 8) yield (q, s"a${(i + q) % 9}", i)
    val y = for (q <- 1L to 3L; i <- 1 to 8) yield (q, s"a${(i * 2 + q) % 9}", i)
    x.toDF("q", "d", "rnk").createOrReplaceTempView("rbo_x")
    y.toDF("q", "d", "rnk").createOrReplaceTempView("rbo_y")
    val sqlDf = spark.sql(
      "SELECT * FROM rbo('rbo_x', 'rbo_y', 'q', 'd', 'rnk', 8, 9, 10)")
    val scalaDf = Rbo.perQuery(
      spark.table("rbo_x"), spark.table("rbo_y"), "q", "d", "rnk", 8, 9, 10)
    assert(sqlDf.columns.toSeq == scalaDf.columns.toSeq)
    assert(sqlDf.exceptAll(scalaDf).isEmpty && scalaDf.exceptAll(sqlDf).isEmpty)
  }
}
