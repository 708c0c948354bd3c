package graft

import graft.operators.MannWhitney

class MannWhitneySpec extends SparkSpec {
  init()
  import spark.implicits._

  private def brute(rows: Seq[(String, Long)], a: String)
      : (Long, Long, Long, Long, Long, BigInt) = {
    val na = BigInt(rows.count(_._1 == a))
    val n = BigInt(rows.size)
    val grain = rows.groupBy(_._2).toSeq.sortBy(_._1)
    var before = BigInt(0)
    var r2a = BigInt(0)
    var ties = BigInt(0)
    grain.foreach { case (_, g) =>
      val cnt = BigInt(g.size)
      val ca = BigInt(g.count(_._1 == a))
      r2a += ca * (2 * before + cnt + 1)
      ties += cnt * cnt * cnt - cnt
      before += cnt
    }
    val u2a = r2a - na * (na + 1)
    val nb = n - na
    val cles = if (na == 0 || nb == 0) BigInt(0) else (BigInt(1000000) * u2a) / (2 * na * nb)
    val v12 = na * nb * ((n + 1) * n * (n - 1) - ties)
    (na.toLong, nb.toLong, u2a.toLong, (2 * na * nb - u2a).toLong, cles.toLong, v12)
  }

  private def run(rows: Seq[(String, Long)]): (Long, Long, Long, Long, Long, BigInt) = {
    val r = MannWhitney.uTest(rows.toDF("g", "v"), "g", "v", "a", "b")
      .as[(Long, Long, Long, Long, Long, String)].head()
    (r._1, r._2, r._3, r._4, r._5, BigInt(r._6))
  }

  test("fully separated samples: U_a = 0, CLES = 0") {
    val rows = Seq("a" -> 1L, "a" -> 2L, "a" -> 3L, "b" -> 4L, "b" -> 5L, "b" -> 6L)
    assert(run(rows) == ((3L, 3L, 0L, 18L, 0L, BigInt(3 * 3) * (7 * 6 * 5 - 0))))
  }

  test("hand-computed tie case: midranks double-scale exactly") {
    // A={1,1}, B={1,2}: U_A = 1 (two half-ties), var12s = 2*2*(60-24) = 144
    val rows = Seq("a" -> 1L, "a" -> 1L, "b" -> 1L, "b" -> 2L)
    val got = run(rows)
    assert(got == ((2L, 2L, 2L, 6L, 250000L, BigInt(144))))
  }

  test("matches the BigInt replay on an interleaved tied fixture") {
    val rows = (0 until 400).map(i => (if (i % 3 == 0) "a" else "b", ((i * 13) % 29).toLong))
    assert(run(rows) == brute(rows, "a"))
  }

  test("identical samples: CLES = 1/2") {
    val rows = (0 until 50).flatMap(i => Seq("a" -> (i % 7).toLong, "b" -> (i % 7).toLong))
    val got = run(rows)
    assert(got._5 == 500000L)
    assert(got._3 == got._4)
  }

  test("deterministic under repartition") {
    val rows = (0 until 300).map(i => (if (i % 2 == 0) "a" else "b", ((i * 7) % 31).toLong))
    val df = rows.toDF("g", "v")
    val x = MannWhitney.uTest(df, "g", "v", "a", "b").collect().toSeq
    val y = MannWhitney.uTest(df.repartition(19), "g", "v", "a", "b").collect().toSeq
    assert(x == y)
  }

  test("foreign labels and negative values fail by name") {
    val bad = Seq("c" -> 1L).toDF("g", "v")
    val ex = intercept[Exception] { MannWhitney.uTest(bad, "g", "v", "a", "b").collect() }
    assert(ex.getMessage.contains("sample label must be")
      || ex.getCause != null && ex.getCause.getMessage.contains("sample label must be"))
    val neg = Seq("a" -> -5L).toDF("g", "v")
    val exN = intercept[Exception] { MannWhitney.uTest(neg, "g", "v", "a", "b").collect() }
    assert(exN.getMessage.contains("values must be >= 0")
      || exN.getCause != null && exN.getCause.getMessage.contains("values must be >= 0"))
  }
}
