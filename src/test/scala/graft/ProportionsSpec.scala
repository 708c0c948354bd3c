package graft

import graft.operators.{Drift, Proportions}

class ProportionsSpec extends SparkSpec {
  init()
  import spark.implicits._

  private def zTest(rows: Seq[(String, Long)]): (Long, Long, Long, Long, Long, Long, Long) =
    Proportions.zTest(rows.toDF("g", "y"), "g", "y", "a", "b")
      .as[(Long, Long, Long, Long, Long, Long, Long)].head()

  private def bruteZ2(rows: Seq[(String, Long)]): Long = {
    val na = BigInt(rows.count(_._1 == "a"))
    val nb = BigInt(rows.count(_._1 == "b"))
    val xa = BigInt(rows.filter(_._1 == "a").map(_._2).sum)
    val xb = BigInt(rows.filter(_._1 == "b").map(_._2).sum)
    val den = na * nb * (xa + xb) * (na + nb - xa - xb)
    if (den == 0) 0L
    else ((BigInt(1000000) * (xa * nb - xb * na).pow(2) * (na + nb)) / den).toLong
  }

  test("equal rates score ~0; a strong lift crosses the 3.84 significance bar") {
    val equal = (0 until 200).map(i => (if (i % 2 == 0) "a" else "b", ((i / 2) % 2).toLong))
    val (na, nb, _, _, ra, rb, z2) = zTest(equal)
    assert(na == 100L && nb == 100L && ra == rb)
    assert(z2 == 0L)
    // a: 50% of 200; b: 25% of 200 -> z2 well above 3.84e6 ppm
    val lift = (0 until 200).map(i => ("a", (i % 2).toLong)) ++
      (0 until 200).map(i => ("b", (if (i % 4 == 0) 1 else 0).toLong))
    val r = zTest(lift)
    assert(r._7 == bruteZ2(lift))
    assert(r._7 > 3840000L, s"z2=${r._7}")
  }

  test("matches the BigInt replay; degenerate pools report 0") {
    val rows = (0 until 300).map(i =>
      (if (i % 3 == 0) "a" else "b", (if ((i * 7) % 5 == 0) 1 else 0).toLong))
    assert(zTest(rows)._7 == bruteZ2(rows))
    val allZero = Seq(("a", 0L), ("b", 0L))
    assert(zTest(allZero)._7 == 0L)
    val allOne = Seq(("a", 1L), ("b", 1L))
    assert(zTest(allOne)._7 == 0L)
  }

  test("KS distance: identical samples 0, disjoint samples 10000 bp, brute parity") {
    val a = (0 until 100).map(i => (i % 10).toLong)
    assert(ks(a, a) == ((100L, 100L, BigInt(0), 0L)))
    val b = (0 until 50).map(i => (i % 10 + 100).toLong)
    assert(ks(a, b)._4 == 10000L)
    val c = (0 until 80).map(i => ((i * 7) % 13).toLong)
    val got = ks(a, c)
    assert(got._3 == bruteKs(a, c) && got._4 ==
      (BigInt(10000) * got._3 / (BigInt(100) * 80)).toLong)
  }

  private def ks(a: Seq[Long], b: Seq[Long]): (Long, Long, BigInt, Long) = {
    val r = Drift.ksStatistic(a.toDF("v"), b.toDF("v"), "v")
      .as[(Long, Long, Long, Long)].head()
    (r._1, r._2, BigInt(r._3), r._4)
  }

  private def bruteKs(a: Seq[Long], b: Seq[Long]): BigInt = {
    val vs = (a ++ b).distinct.sorted
    val na = BigInt(a.size)
    val nb = BigInt(b.size)
    vs.map(v => ((BigInt(a.count(_ <= v)) * nb) - (BigInt(b.count(_ <= v)) * na)).abs).max
  }
}
