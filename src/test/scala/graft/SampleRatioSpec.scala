package graft

import graft.operators.SampleRatio

class SampleRatioSpec extends SparkSpec {
  init()
  import spark.implicits._

  private def run(rows: Seq[String], ea: Long = 1L, eb: Long = 1L)
      : (Long, Long, Long, Long, Long, Long, Long, Boolean) =
    SampleRatio.check(rows.toDF("g"), "g", "a", "b", ea, eb)
      .as[(Long, Long, Long, Long, Long, Long, Long, Boolean)].head()

  private def brute(rows: Seq[String], ea: Long, eb: Long)
      : (Long, Long, Long, Long, Long, Long, Long, Boolean) = {
    val na = BigInt(rows.count(_ == "a"))
    val nb = BigInt(rows.count(_ == "b"))
    val n = na + nb
    val cd = BigInt(ea + eb)
    def term(o: BigInt, e: Long) = {
      val z = o * cd - n * e
      BigInt(1000000) * z * z / (cd * n * e)
    }
    val srm = term(na, ea) + term(nb, eb)
    (na.toLong, nb.toLong, ea, eb, (BigInt(1000000) * na / n).toLong,
      1000000L * ea / (ea + eb), srm.toLong, srm > 10830000L)
  }

  test("an exact 1:1 split scores 0; a broken split alarms") {
    val even = (0 until 1000).map(i => if (i % 2 == 0) "a" else "b")
    val got = run(even)
    assert(got == brute(even, 1, 1))
    assert(got._7 == 0L && !got._8)
    // 600:400 on a 1:1 design: chi2 = 40 -> 4e7 ppm, well past the bar
    val broken = Seq.fill(600)("a") ++ Seq.fill(400)("b")
    val bad = run(broken)
    assert(bad == brute(broken, 1, 1))
    assert(bad._7 == 40000000L && bad._8)
  }

  test("non-1:1 designs: a 9:1 rollout delivered at 9:1 passes") {
    val rows = Seq.fill(900)("a") ++ Seq.fill(100)("b")
    val got = run(rows, 9, 1)
    assert(got == brute(rows, 9, 1))
    assert(got._7 == 0L && got._6 == 900000L)
    // same traffic judged against 1:1 alarms
    assert(run(rows, 1, 1)._8)
  }

  test("matches the BigInt replay on uneven fixtures") {
    val rows = (0 until 777).map(i => if (i % 7 < 3) "a" else "b")
    assert(run(rows) == brute(rows, 1, 1))
    assert(run(rows, 3, 4) == brute(rows, 3, 4))
  }

  test("foreign labels and empty input fail by name") {
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    val e1 = intercept[Exception] { run(Seq("a", "x")) }
    assert(msgs(e1).exists(_.contains("arm must be")))
    val e2 = intercept[Exception] { run(Seq.empty[String]) }
    assert(msgs(e2).exists(_.contains("no rows")))
  }

  test("srm_check TVF round-trips the Scala path") {
    val rows = (0 until 500).map(i => if (i % 5 < 2) "a" else "b")
    rows.toDF("g").createOrReplaceTempView("srm_rows")
    val sqlDf = spark.sql("SELECT * FROM srm_check('srm_rows', 'g', 'a', 'b', 2, 3)")
    val scalaDf = SampleRatio.check(spark.table("srm_rows"), "g", "a", "b", 2, 3)
    assert(sqlDf.columns.toSeq == scalaDf.columns.toSeq)
    assert(sqlDf.exceptAll(scalaDf).isEmpty && scalaDf.exceptAll(sqlDf).isEmpty)
  }
}
