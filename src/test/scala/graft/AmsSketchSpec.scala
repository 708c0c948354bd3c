package graft

import graft.operators.AmsSketch

class AmsSketchSpec extends SparkSpec {
  init()
  import spark.implicits._

  // skewed keys: key i appears i+1 times, i in 0..19 → F2 = Σ (i+1)^2
  private def rows = (0 until 20).flatMap(i => Seq.fill(i + 1)(s"k$i")).toDF("k")
  private val trueF2 = (1 to 20).map(i => i.toLong * i).sum

  test("counters are exact signed sums; estimate is their mean square") {
    val sk = AmsSketch.build(rows, "k", s = 16)
    val counters = sk.as[(Int, Long)].collect().toMap
    assert(counters.size == 16)
    // replay one counter by hand
    val keys = (0 until 20).flatMap(i => Seq.fill(i + 1)(s"k$i"))
    val md = java.security.MessageDigest.getInstance("MD5")
    def sign(r: Int, k: String): Long = {
      val hex = md.digest(k.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      if (hex.charAt(r) <= '7') 1L else -1L
    }
    assert(counters(3) == keys.map(sign(3, _)).sum)
    val est = AmsSketch.f2Estimate(sk).as[(Long, Long)].head()
    assert(est._1 == 16L)
    assert(est._2 == counters.values.map(c => c * c).sum / 16)
  }

  test("estimate lands within the AMS variance band on the fixed fixture") {
    val est = AmsSketch.f2Estimate(AmsSketch.build(rows, "k", 16))
      .as[(Long, Long)].head()._2
    val ratio = est.toDouble / trueF2
    assert(ratio > 0.3 && ratio < 3.0, s"F2 est off: $est vs $trueF2")
  }

  test("linearity: sketches of disjoint halves merge counter-wise to the whole") {
    val a = rows.filter($"k" < "k5")
    val b = rows.filter(!($"k" < "k5"))
    val merged = AmsSketch.merge(
      AmsSketch.build(a, "k", 8), AmsSketch.build(b, "k", 8))
      .orderBy("r").as[(Int, Long)].collect().toSeq
    val whole = AmsSketch.build(rows, "k", 8)
      .orderBy("r").as[(Int, Long)].collect().toSeq
    assert(merged == whole)
  }

  test("empty input: zero counters, zero estimate") {
    val sk = AmsSketch.build(rows.limit(0), "k", 4)
    assert(sk.as[(Int, Long)].collect().toSeq.forall(_._2 == 0L))
    assert(AmsSketch.f2Estimate(sk).as[(Long, Long)].head() == ((4L, 0L)))
  }

  test("join-size estimate: inner product recovers a known equi-join size") {
    // A: key i × (i+1); B: key i × 2 for even i → |A ⋈ B| = Σ_even 2(i+1)
    val a = rows
    val b = (0 until 20 by 2).flatMap(i => Seq.fill(2)(s"k$i")).toDF("k")
    val trueSize = (0 until 20 by 2).map(i => 2L * (i + 1)).sum
    val est = AmsSketch.joinSizeEstimate(
      AmsSketch.build(a, "k", 32), AmsSketch.build(b, "k", 32))
      .as[(Long, Long)].head()
    assert(est._1 == 32L)
    val ratio = est._2.toDouble / trueSize
    assert(ratio > 0.2 && ratio < 3.0, s"join size est off: ${est._2} vs $trueSize")
  }

  test("join-size estimate of a relation with itself is the F2 estimate") {
    val sk = AmsSketch.build(rows, "k", 16)
    val self = AmsSketch.joinSizeEstimate(sk, sk).as[(Long, Long)].head()._2
    val f2 = AmsSketch.f2Estimate(sk).as[(Long, Long)].head()._2
    assert(self == f2)
  }

  test("ams_f2 TVF round-trips the Scala path") {
    rows.createOrReplaceTempView("ams_rows")
    val tvf = spark.sql("SELECT * FROM ams_f2('ams_rows', 'k', 16)")
      .orderBy("r").collect().toSeq
    val direct = AmsSketch.build(rows, "k", 16).orderBy("r").collect().toSeq
    assert(tvf == direct)
  }
}
