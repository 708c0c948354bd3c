package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.Prop.forAll

import graft.operators.PrefixSum

class PrefixSumSpec extends SparkSpec {
  init()
  import spark.implicits._

  private def check(prop: Prop, minTests: Int = 30): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(minTests), prop)
    assert(res.passed, res.status.toString)
  }

  test("property: exclusive prefix equals the sequential scan for any sparse keys / block size") {
    // keys sparse and arbitrary (incl. huge gaps), block sizes down to the
    // minimum 2 — every shape must equal the driver-side running sum.
    // Key magnitude is tied to the block size so recursion depth (≈
    // log_bs(maxKey)) stays bounded per sample.
    val gen = for {
      bs <- Gen.oneOf(2, 3, 7, 4096)
      maxK = if (bs >= 4096) 5000000000L else 200L
      n <- Gen.choose(0, 40)
      es <- Gen.listOfN(n, Gen.zip(Gen.choose(0L, maxK), Gen.choose(-1000L, 1000L)))
    } yield (es.distinctBy(_._1), bs)
    check(forAll(gen) { case (es, bs) =>
      val got = PrefixSum.exclusive(es.toDF("k", "s"), bs)
        .orderBy("k").as[(Long, Long)].collect().toSeq
      val sorted = es.sortBy(_._1)
      val want = sorted.map(_._1).zip(
        sorted.map(_._2).scanLeft(0L)(_ + _).init)
      Prop(got == want) :| s"n=${es.size} bs=$bs"
    })
  }

  test("single-block tail boundary: n == blockSize and n == blockSize + 1 agree with the scan") {
    // bs = 5: n = 5 takes the one-window tail, n = 6 takes the recursion —
    // both must equal the sequential scan across the branch boundary.
    for (n <- Seq(5, 6)) {
      val es = (0 until n).map(i => (i * 37L, i + 1L))
      val got = PrefixSum.exclusive(es.toDF("k", "s"), 5)
        .orderBy("k").as[(Long, Long)].collect().toSeq
      val want = es.map(_._1).zip(es.map(_._2).scanLeft(0L)(_ + _).init)
      assert(got == want, s"n=$n")
    }
  }

  test("long sums stay exact longs; decimal inputs stay decimal") {
    val big = Seq((0L, Long.MaxValue / 4), (10L, Long.MaxValue / 4), (20L, Long.MaxValue / 4))
    val got = PrefixSum.exclusive(big.toDF("k", "s"), 2)
      .orderBy("k").as[(Long, Long)].collect().toSeq
    assert(got.map(_._2) == Seq(0L, Long.MaxValue / 4, Long.MaxValue / 4 * 2))
    val dec = Seq((0L, BigDecimal("12345678901234567890")), (5L, BigDecimal("1")))
      .toDF("k", "s")
    val gd = PrefixSum.exclusive(dec, 2).orderBy("k").collect()
    assert(gd(1).getDecimal(1).toBigInteger.toString == "12345678901234567890")
  }
}
