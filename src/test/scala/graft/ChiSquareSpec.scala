package graft

import graft.operators.ChiSquare

class ChiSquareSpec extends SparkSpec {
  init()
  import spark.implicits._

  private def run(rows: Seq[(String, String)])
      : (Map[(String, String), (Long, Long, Long, Long)], Long, Long) = {
    val out = ChiSquare.independence(rows.toDF("u", "v"), "u", "v")
      .as[(String, String, Long, Long, Long, Long, Long, Long)].collect()
    (out.map(r => (r._1, r._2) -> ((r._3, r._4, r._5, r._6))).toMap,
      out.head._7, out.head._8)
  }

  private def brute(rows: Seq[(String, String)])
      : (Map[(String, String), (Long, Long, Long, Long)], Long, Long) = {
    val n = BigInt(rows.size)
    val o = rows.groupBy(identity).map { case (k, v) => k -> BigInt(v.size) }
    val xs = rows.map(_._1).distinct
    val ys = rows.map(_._2).distinct
    val r = xs.map(x => x -> rows.count(_._1 == x)).toMap
    val c = ys.map(y => y -> rows.count(_._2 == y)).toMap
    val cells = (for { x <- xs; y <- ys } yield {
      val oo = o.getOrElse((x, y), BigInt(0))
      val z = oo * n - BigInt(r(x)) * c(y)
      val contrib = BigInt(1000000) * z * z / (BigInt(r(x)) * c(y) * n)
      (x, y) -> ((oo.toLong, r(x).toLong, c(y).toLong, contrib.toLong))
    }).toMap
    val chi2 = cells.values.map(_._4).sum
    (cells, chi2, (xs.size - 1).toLong * (ys.size - 1))
  }

  test("a perfectly independent table scores zero on every cell") {
    val rows = for { x <- Seq("a", "b"); y <- Seq("p", "q", "r"); _ <- 0 until 5 }
      yield (x, y)
    val (cells, chi2, dof) = run(rows)
    assert(chi2 == 0L && dof == 2L)
    assert(cells.values.forall(_._4 == 0L))
  }

  test("a perfectly dependent 2x2 table hits chi2 = n at ppm scale") {
    // x determines y exactly: chi-square = n
    val rows = (0 until 40).map(i => if (i % 2 == 0) ("a", "p") else ("b", "q"))
    val (cells, chi2, dof) = run(rows)
    assert(brute(rows) == ((cells, chi2, dof)))
    assert(chi2 == 40L * 1000000L && dof == 1L)
  }

  test("matches the BigInt replay with absent cells enumerated") {
    // (i²) % 7 hits only the quadratic residues {0,1,2,4}: 4 distinct y
    val rows = (0 until 300).map(i => (s"x${i % 5}", s"y${(i * i) % 7}"))
    assert(run(rows) == brute(rows))
    // absent cells really appear: the 5×4 marginal cross, not just
    // observed cells (x0 pairs with every residue class it never hits)
    val xs = rows.map(_._1).distinct.size
    val ys = rows.map(_._2).distinct.size
    assert(run(rows)._1.size == xs * ys && xs * ys == 20)
  }

  test("chi2_independence TVF round-trips the Scala path") {
    val rows = (0 until 300).map(i => (s"x${i % 5}", s"y${(i * i) % 7}"))
    rows.toDF("u", "v").createOrReplaceTempView("chi2_rows")
    val sqlDf = spark.sql("SELECT * FROM chi2_independence('chi2_rows', 'u', 'v')")
    val scalaDf = ChiSquare.independence(spark.table("chi2_rows"), "u", "v")
    assert(sqlDf.columns.toSeq == scalaDf.columns.toSeq)
    assert(sqlDf.exceptAll(scalaDf).isEmpty && scalaDf.exceptAll(sqlDf).isEmpty)
  }

  test("width contract fails by name; deterministic under repartition") {
    // can't build 1e8 rows in a spec: check determinism instead and trust
    // the require (asserted on the driver-side count)
    val rows = (0 until 200).map(i => (s"x${i % 3}", s"y${i % 4}"))
    val df = rows.toDF("u", "v")
    val x = ChiSquare.independence(df, "u", "v").orderBy("x", "y").collect().toSeq
    val y = ChiSquare.independence(df.repartition(7), "u", "v")
      .orderBy("x", "y").collect().toSeq
    assert(x == y)
  }
}
