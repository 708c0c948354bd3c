package graft

import graft.operators.Balance

class BalanceSpec extends SparkSpec {
  init()
  import spark.implicits._

  private def run(rows: Seq[(String, Long)])
      : (Long, Long, Long, Long, Long, Long, Long, Boolean) =
    Balance.smd(rows.toDF("g", "x"), "g", "x", "a", "b")
      .as[(Long, Long, Long, Long, Long, Long, Long, Boolean)].head()

  private def brute(rows: Seq[(String, Long)])
      : (Long, Long, Long, Long, Long, Long, Long, Boolean) = {
    def stats(l: String) = {
      val xs = rows.filter(_._1 == l).map(r => BigInt(r._2))
      (BigInt(xs.size), xs.sum, xs.map(x => x * x).sum)
    }
    val (na, sa, qa) = stats("a")
    val (nb, sb, qb) = stats("b")
    val ma = BigInt(1000000) * sa / na
    val mb = BigInt(1000000) * sb / nb
    val va = (na * qa - sa * sa) / (na * na)
    val vb = (nb * qb - sb * sb) / (nb * nb)
    val smd2 =
      if (va + vb == 0 && ma == mb) BigInt(0)
      else 2 * (ma - mb) * (ma - mb) / (BigInt(1000000) * (va + vb))
    (na.toLong, nb.toLong, ma.toLong, mb.toLong, va.toLong, vb.toLong,
      smd2.toLong, smd2 < 10000)
  }

  test("identically distributed arms are balanced; a shifted arm is not") {
    val same = (0 until 200).map(i => (if (i % 2 == 0) "a" else "b", ((i / 2) % 10).toLong))
    val got = run(same)
    assert(got == brute(same))
    assert(got._8, s"identical arms must be balanced: $got")
    val shifted = (0 until 100).map(i => ("a", (i % 10).toLong + 50)) ++
      (0 until 100).map(i => ("b", (i % 10).toLong))
    val bad = run(shifted)
    assert(bad == brute(shifted))
    assert(!bad._8 && bad._7 > 10000L)
  }

  test("matches the BigInt replay on a skewed fixture") {
    val rows = (0 until 500).map(i =>
      (if (i % 3 == 0) "a" else "b", ((i * i * 7) % 97).toLong))
    assert(run(rows) == brute(rows))
  }

  test("constant equal arms report 0; constant unequal arms fail by name") {
    val eq = Seq(("a", 5L), ("a", 5L), ("b", 5L), ("b", 5L))
    assert(run(eq)._7 == 0L && run(eq)._8)
    val uneq = Seq(("a", 5L), ("a", 5L), ("b", 7L), ("b", 7L))
    val ex = intercept[Exception] { run(uneq) }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("unbounded")))
  }

  test("low-but-nonzero variance that floors to 0 fails distinctly, not as unbounded") {
    // round-13 ADVICE scenario: counts {0,0,1} per arm — true var 2/9
    // floors to 0, means differ; the exact-numerator test must route
    // this to the scale-upstream error, never the unbounded raise
    val rows = Seq(("a", 0L), ("a", 0L), ("a", 1L), ("b", 0L), ("b", 1L), ("b", 1L))
    val ex = intercept[Exception] { run(rows) }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("scale x upstream")), msgs(ex).mkString("|"))
    assert(!msgs(ex).exists(_.contains("unbounded")))
    // and the same shape SCALED by 1000 upstream ships a finite readout
    val scaled = rows.map { case (g, x) => (g, x * 1000L) }
    val got = run(scaled)
    assert(got._7 > 0L, s"scaled SMD must be finite and positive: $got")
  }

  test("foreign labels and empty arms fail by name") {
    val ex1 = intercept[Exception] { run(Seq(("c", 1L), ("a", 1L), ("b", 1L))) }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex1).exists(_.contains("arm must be")))
    val ex2 = intercept[Exception] { run(Seq(("a", 1L), ("a", 2L))) }
    assert(msgs(ex2).exists(_.contains("non-empty")))
  }

  test("smd_balance TVF round-trips the Scala path") {
    val rows = (0 until 300).map(i =>
      (if (i % 2 == 0) "a" else "b", ((i * 13) % 31).toLong))
    rows.toDF("g", "x").createOrReplaceTempView("bal_rows")
    val sqlDf = spark.sql("SELECT * FROM smd_balance('bal_rows', 'g', 'x', 'a', 'b')")
    val scalaDf = Balance.smd(spark.table("bal_rows"), "g", "x", "a", "b")
    assert(sqlDf.columns.toSeq == scalaDf.columns.toSeq)
    assert(sqlDf.exceptAll(scalaDf).isEmpty && scalaDf.exceptAll(sqlDf).isEmpty)
  }
}
