package graft

import graft.operators.Keyness

class KeynessSpec extends SparkSpec {
  init()

  import spark.implicits._

  /** Brute-force lift over exact BigInt rationals. */
  private def brute(
      docs: Seq[(String, String)], minCount: Long, k: Int): Map[String, Seq[(String, Long, Long)]] = {
    val occ = docs.flatMap { case (g, t) => t.split(" ").filter(_.nonEmpty).map(g -> _) }
    val cgt = occ.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val nG = occ.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val tT = occ.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val n = occ.size.toLong
    cgt.toSeq
      .filter(_._2 >= minCount)
      .map { case ((g, t), c) =>
        (g, t, c, (BigInt(10000) * c * n / (BigInt(nG(g)) * tT(t))).toLong)
      }
      .groupBy(_._1).view
      .mapValues(_.sortBy(r => (-r._4, r._2)).take(k).map(r => (r._2, r._3, r._4)))
      .toMap
  }

  test("planted domain terms top their group's list") {
    // "zebra" appears only in group a: lift = N / n_a in bp (maximal)
    val docs = Seq(
      ("a", "zebra zebra common common filler filler filler"),
      ("a", "zebra common filler filler filler filler filler"),
      ("b", "common common filler filler filler filler filler"),
      ("b", "common filler filler filler filler filler filler"))
    val got = Keyness.distinctiveTerms(docs.toDF("src", "text"), "src", "text", 2, 3)
      .as[(String, String, Long, Long, Int)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._5).map(r => (r._2, r._3, r._4)).toSeq).toMap
    val want = brute(docs, 2, 3)
    assert(got == want, s"got $got\nwant $want")
    assert(got("a").head._1 == "zebra", got.toString)
    // zebra: c=3, n_a=14, total=3, N=28 → 10000·3·28/(14·3) = 20000
    assert(got("a").head._3 == 20000L)
  }

  test("min-count gate drops rare terms; ranks are dense per group") {
    val docs = Seq(
      ("a", "hapax aa aa aa bb bb cc"),
      ("b", "aa bb bb bb cc cc cc"))
    val got = Keyness.distinctiveTerms(docs.toDF("src", "text"), "src", "text", 2, 10)
      .as[(String, String, Long, Long, Int)].collect()
    assert(!got.exists(_._2 == "hapax"))
    got.groupBy(_._1).foreach { case (_, rs) =>
      assert(rs.map(_._5).sorted.toSeq == (1 to rs.length).toSeq)
    }
    val want = brute(docs, 2, 10)
    assert(got.groupBy(_._1).view
      .mapValues(_.sortBy(_._5).map(r => (r._2, r._3, r._4)).toSeq).toMap == want)
  }

  test("matches brute force on the smoke corpus per source") {
    val docsDf = graft.core.Tables(spark, sfSmoke, "documents")
    val docs = docsDf.selectExpr("source", "text").as[(String, String)].collect().toSeq
    val got = Keyness.distinctiveTerms(docsDf, "source", "text", 3, 10)
      .as[(String, String, Long, Long, Int)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._5).map(r => (r._2, r._3, r._4)).toSeq).toMap
    assert(got == brute(docs, 3, 10))
  }
}
