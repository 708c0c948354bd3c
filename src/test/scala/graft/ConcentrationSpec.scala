package graft

import graft.operators.Concentration

class ConcentrationSpec extends SparkSpec {
  init()
  import spark.implicits._

  private def giniOf(rows: Seq[(String, Long)]): Long = {
    Concentration.lorenz(rows.toDF("e", "w"), "e", Some("w"))
      .select("gini_ppm").as[Long].head()
  }

  private def bruteGini(weights: Seq[Long]): Long = {
    val sorted = weights.sorted
    val n = BigInt(sorted.size)
    val bigW = BigInt(sorted.sum)
    if (n * bigW == 0) 0L
    else {
      var cum = BigInt(0)
      var s = BigInt(0)
      sorted.foreach { w => cum += w; s += 2 * cum - w }
      (BigInt(1000000) - BigInt(1000000) * s / (n * bigW)).toLong
    }
  }

  test("perfect equality scores 0; total concentration scores 1 - 1/n") {
    val equal = (0 until 50).map(i => (s"e$i", 7L))
    assert(giniOf(equal) == 0L)
    val oneOwner = (0 until 50).map(i => (s"e$i", if (i == 0) 9000L else 0L))
    // exact: 1e6 - 1e6/n with n = 50 -> 980000
    assert(giniOf(oneOwner) == 980000L)
  }

  test("gini matches the sorted per-entity definition on a mixed fixture") {
    val rows = (0 until 200).map(i => (s"e$i", ((i * i * 13) % 97).toLong))
    assert(giniOf(rows) == bruteGini(rows.map(_._2)))
  }

  test("lorenz table: shares are cumulative, end at 10000/10000, count-of-counts exact") {
    val rows = (0 until 120).map(i => (s"e$i", (i % 4).toLong)) // totals 0,1,2,3 x30
    val got = Concentration.lorenz(rows.toDF("e", "w"), "e", Some("w"))
      .orderBy("t")
      .select("t", "m", "cum_entities", "entity_share_bp", "weight_share_bp")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got.map(r => (r._1, r._2)) == Seq((0L, 30L), (1L, 30L), (2L, 30L), (3L, 30L)))
    assert(got.map(_._3) == Seq(30L, 60L, 90L, 120L))
    assert(got.last._4 == 10000L && got.last._5 == 10000L)
    // W = 30*(0+1+2+3) = 180; cum weights 0, 30, 90, 180
    assert(got.map(_._5) == Seq(0L, 10000L * 30 / 180, 10000L * 90 / 180, 10000L))
  }

  test("count mode (no weight column) equals weight mode with unit-count totals") {
    val ev = (0 until 300).map(i => "u" + (i % 17) * (i % 5 + 1) % 23)
    val a = Concentration.lorenz(ev.toDF("e"), "e")
      .orderBy("t").collect().toSeq
    val totals = ev.groupBy(identity).map { case (u, o) => (u, o.size.toLong) }.toSeq
    val b = Concentration.lorenz(totals.toDF("e", "w"), "e", Some("w"))
      .orderBy("t").collect().toSeq
    assert(a == b)
  }

  test("deterministic under repartition") {
    val rows = (0 until 400).map(i => (s"e${i % 37}", ((i * 31) % 11).toLong))
    val df = rows.toDF("e", "w")
    val a = Concentration.lorenz(df, "e", Some("w")).orderBy("t").collect().toSeq
    val b = Concentration.lorenz(df.repartition(13), "e", Some("w"))
      .orderBy("t").collect().toSeq
    assert(a == b)
  }
}
