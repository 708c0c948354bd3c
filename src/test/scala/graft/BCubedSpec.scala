package graft

import graft.operators.BCubed

class BCubedSpec extends SparkSpec {
  init()
  import spark.implicits._

  private def run(rows: Seq[(Long, String, String)])
      : (Long, Long, Long, Long, Long, Long) =
    BCubed.score(rows.toDF("id", "cluster", "label"))
      .as[(Long, Long, Long, Long, Long, Long)].head()

  private def brute(rows: Seq[(Long, String, String)])
      : (Long, Long, Long, Long, Long, Long) = {
    val n = BigInt(rows.size)
    val cells = rows.groupBy(r => (r._2, r._3)).map { case (k, v) => k -> BigInt(v.size) }
    def marg(f: ((String, String)) => String) =
      cells.groupBy { case (k, _) => f(k) }.map { case (k, v) => k -> v.values.sum }
    val nc = marg(_._1)
    val nl = marg(_._2)
    val p = cells.map { case ((c, _), m) => BigInt(1000000) * m * m / nc(c) }.sum / n
    val r = cells.map { case ((_, l), m) => BigInt(1000000) * m * m / nl(l) }.sum / n
    val f1 = if (p + r == 0) BigInt(0) else 2 * p * r / (p + r)
    (n.toLong, nc.size.toLong, nl.size.toLong, p.toLong, r.toLong, f1.toLong)
  }

  test("a perfect clustering scores 1e6 on precision, recall and F1") {
    val rows = (0 until 60).map(i => (i.toLong, s"c${i % 3}", s"c${i % 3}"))
    assert(run(rows) == ((60L, 3L, 3L, 1000000L, 1000000L, 1000000L)))
  }

  test("all-in-one cluster: perfect recall, precision = the label-mass ratio") {
    // 40 of label a, 10 of b: P = (40/50)*(40/50)*0.8-weighting...
    // exact: sum cells m^2/n_c = (1600 + 100)/50 = 34 -> P = 34/50
    val rows = (0 until 50).map(i => (i.toLong, "all", if (i < 40) "a" else "b"))
    val got = run(rows)
    assert(got == brute(rows))
    assert(got._5 == 1000000L) // recall perfect
    assert(got._4 == 680000L) // 34/50
  }

  test("singletons: perfect precision, recall = the class-size inverse mean") {
    val rows = (0 until 30).map(i => (i.toLong, s"s$i", s"l${i % 2}"))
    val got = run(rows)
    assert(got == brute(rows))
    assert(got._4 == 1000000L)
    assert(got._5 == 1000000L / 15) // each item sees 1/15 of its class
  }

  test("matches the BigInt replay on a skewed fixture; empty fails by name") {
    val rows = (0 until 300).map(i =>
      (i.toLong, s"c${(i * i) % 7}", s"l${(i * 13) % 4}"))
    assert(run(rows) == brute(rows))
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    val ex = intercept[Exception] { run(Seq.empty) }
    assert(msgs(ex).exists(_.contains("no rows")))
  }

  test("bcubed TVF round-trips the Scala path") {
    val rows = (0 until 200).map(i =>
      (i.toLong, s"c${(i * 3) % 5}", s"l${i % 4}"))
    rows.toDF("id", "cluster", "label").createOrReplaceTempView("bc_rows")
    val sqlDf = spark.sql("SELECT * FROM bcubed('bc_rows', 'cluster', 'label')")
    val scalaDf = BCubed.score(spark.table("bc_rows"))
    assert(sqlDf.columns.toSeq == scalaDf.columns.toSeq)
    assert(sqlDf.exceptAll(scalaDf).isEmpty && scalaDf.exceptAll(sqlDf).isEmpty)
  }
}
