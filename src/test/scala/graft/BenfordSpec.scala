package graft

import graft.operators.Benford

class BenfordSpec extends SparkSpec {
  init()
  import spark.implicits._

  private def run(vals: Seq[Long]): (Map[Int, (Long, Long, Long, Long)], Long) = {
    val out = Benford.firstDigit(vals.toDF("v"), "v")
      .as[(Int, Long, Long, Long, Long, Long)].collect()
    (out.map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap, out.head._6)
  }

  private def brute(vals: Seq[Long]): (Map[Int, (Long, Long, Long, Long)], Long) = {
    val n = BigInt(vals.size)
    val o = vals.groupBy(_.toString.head.asDigit).map { case (d, v) => d -> BigInt(v.size) }
    val cells = Benford.ExpectedPpm.map { case (d, e) =>
      val oo = o.getOrElse(d, BigInt(0))
      val z = BigInt(1000000) * oo - n * e
      d -> ((oo.toLong, e, (BigInt(1000000) * oo / n).toLong,
        (z * z / (n * e)).toLong))
    }.toMap
    (cells, cells.values.map(_._4).sum)
  }

  test("a perfectly Benford multiset scores near zero; all 9 digits report") {
    // counts proportional to the ppm table itself at n = 10^6
    val vals = Benford.ExpectedPpm.flatMap { case (d, e) =>
      Seq.fill((e / 1000L).toInt)(d.toLong) // n = 1000, expected shape
    }
    val (cells, chi2) = run(vals)
    assert(cells == brute(vals)._1)
    assert(cells.size == 9)
    assert(chi2 < 600000L, s"near-Benford data must score low, got $chi2")
  }

  test("uniform digits score high; absent digits still report with o = 0") {
    val uniform = (0 until 900).map(i => (i % 9 + 1).toLong)
    val (cells, chi2) = run(uniform)
    assert((cells, chi2) == brute(uniform))
    assert(chi2 > 15500000L, s"uniform digits must fail the audit, got $chi2")
    val onlyNines = Seq.fill(50)(9L)
    val (c9, _) = run(onlyNines)
    assert(c9(1)._1 == 0L && c9(9)._1 == 50L && c9.size == 9)
  }

  test("first digits come from the string head at every magnitude") {
    val vals = Seq(1L, 9L, 10L, 99L, 100L, 12345L, 987654321L, 1000000000000L)
    val (cells, _) = run(vals)
    assert(cells(1)._1 == 5L && cells(9)._1 == 3L) // 1,10,100,12345,1e12 / 9,99,987654321
  }

  test("non-positive values fail by name; replay parity on a mixed fixture") {
    val ex = intercept[Exception] {
      Benford.firstDigit(Seq(0L).toDF("v"), "v").collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("Benford")))
    val mixed = (1 until 500).map(i => (i.toLong * i * 7) % 99991L + 1)
    assert(run(mixed) == brute(mixed))
  }

  test("benford_audit TVF round-trips the Scala path") {
    val vals = (1 until 400).map(i => (i.toLong * 13) % 997L + 1)
    vals.toDF("v").createOrReplaceTempView("benford_rows")
    val sqlDf = spark.sql("SELECT * FROM benford_audit('benford_rows', 'v')")
    val scalaDf = Benford.firstDigit(spark.table("benford_rows"), "v")
    assert(sqlDf.columns.toSeq == scalaDf.columns.toSeq)
    assert(sqlDf.exceptAll(scalaDf).isEmpty && scalaDf.exceptAll(sqlDf).isEmpty)
  }
}
