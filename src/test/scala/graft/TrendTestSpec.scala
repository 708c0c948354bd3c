package graft

import graft.operators.TrendTest

class TrendTestSpec extends SparkSpec {
  init()
  import spark.implicits._

  private def run(rows: Seq[(Long, Long)]): (Long, Long, Long, Long) =
    TrendTest.mannKendall(rows.toDF("t", "x"), "t", "x")
      .as[(Long, Long, Long, Long)].head()

  private def brute(rows: Seq[(Long, Long)]): (Long, Long, Long, Long) = {
    val sorted = rows.sortBy(_._1)
    val n = BigInt(rows.size)
    var s = BigInt(0)
    for (i <- sorted.indices; j <- i + 1 until sorted.size)
      s += (sorted(j)._2 compare sorted(i)._2).sign
    val tie = rows.groupBy(_._2).values
      .map(g => BigInt(g.size) * (g.size - 1) * (2 * g.size + 5)).sum
    val v18 = n * (n - 1) * (2 * n + 5) - tie
    val z2 = if (v18 == 0) BigInt(0) else BigInt(1000000) * 18 * s * s / v18
    (n.toLong, s.toLong, v18.toLong, z2.toLong)
  }

  test("strictly increasing series: S = n(n-1)/2, z2 well past the 0.05 bar") {
    val rows = (0L until 30L).map(t => t -> (t * 3 + 1))
    val got = run(rows)
    assert(got == brute(rows))
    assert(got._2 == 30L * 29 / 2)
    assert(got._4 > 3840000L)
  }

  test("a constant series has S = 0 and var18 = 0 (all one tie group)") {
    val rows = (0L until 20L).map(t => t -> 7L)
    assert(run(rows) == ((20L, 0L, 0L, 0L)))
  }

  test("matches the BigInt replay on noisy and tied fixtures") {
    val noisy = (0L until 60L).map(t => t -> ((t * 31 + 7) % 13))
    assert(run(noisy) == brute(noisy))
    val drifty = (0L until 50L).map(t => t -> (t / 5 + (t * 17) % 3))
    assert(run(drifty) == brute(drifty))
  }

  test("duplicate time points and tiny inputs fail by name") {
    val dup = Seq((1L, 1L), (1L, 2L), (2L, 3L))
    val e1 = intercept[IllegalArgumentException] {
      TrendTest.mannKendall(dup.toDF("t", "x"), "t", "x")
    }
    assert(e1.getMessage.contains("unique"))
    val e2 = intercept[IllegalArgumentException] {
      TrendTest.mannKendall(Seq((1L, 1L)).toDF("t", "x"), "t", "x")
    }
    assert(e2.getMessage.contains(">= 2"))
  }

  test("mann_kendall TVF round-trips the Scala path") {
    val rows = (0L until 40L).map(t => t -> ((t * 13 + 5) % 11))
    rows.toDF("t", "x").createOrReplaceTempView("mk_rows")
    val sqlDf = spark.sql("SELECT * FROM mann_kendall('mk_rows', 't', 'x')")
    val scalaDf = TrendTest.mannKendall(spark.table("mk_rows"), "t", "x")
    assert(sqlDf.columns.toSeq == scalaDf.columns.toSeq)
    assert(sqlDf.exceptAll(scalaDf).isEmpty && scalaDf.exceptAll(sqlDf).isEmpty)
  }
}
