package graft

import org.scalacheck.{Gen, Test => SCTest}
import org.scalacheck.Prop.forAll

import graft.operators.TheilSen

class TheilSenSpec extends SparkSpec {
  init()
  import spark.implicits._

  private def floorDiv(a: BigInt, b: BigInt): BigInt = {
    val m = ((a % b) + b) % b
    (a - m) / b
  }

  /** Driver-side oracle: lower median of pairwise slopes under exact
    * rational ordering with (num, den) tie-break.
    */
  private def brute(pts: Seq[(Long, Long)]): Option[(Long, Long, Long)] = {
    val pairs = for {
      (x1, y1) <- pts; (x2, y2) <- pts if x2 > x1
    } yield (y2 - y1, x2 - x1)
    if (pairs.isEmpty) None
    else {
      val sorted = pairs.sortWith { case ((n1, d1), (n2, d2)) =>
        val c = BigInt(n1) * d2 compare BigInt(n2) * d1
        if (c != 0) c < 0 else if (n1 != n2) n1 < n2 else d1 < d2
      }
      val (num, den) = sorted((sorted.size + 1) / 2 - 1)
      Some((num, den, floorDiv(BigInt(num) * 1000000, BigInt(den)).toLong))
    }
  }

  test("property: median slope equals the exact rational brute force") {
    val gen = for {
      n <- Gen.choose(2, 12)
      xs <- Gen.listOfN(n, Gen.choose(0L, 400L)).map(_.distinct)
      ys <- Gen.listOfN(xs.size, Gen.choose(-1000L, 1000L))
    } yield xs.zip(ys)
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(25),
      forAll(gen) { pts =>
        val df = pts.map { case (x, y) => ("k", x, y) }.toDF("key", "x", "y")
        val got = TheilSen.medianSlope(df, "key", "x", "y")
          .select("slope_num", "slope_den", "slope_ppm")
          .as[(Long, Long, Long)].collect().headOption
        got == brute(pts)
      })
    assert(res.passed, res.status.toString)
  }

  test("keys are independent; single-point and vertical-only keys drop") {
    val df = Seq(
      ("up", 0L, 0L), ("up", 1L, 10L), ("up", 2L, 20L),
      ("down", 0L, 9L), ("down", 3L, 0L),
      ("lone", 5L, 5L),
      ("vert", 7L, 1L), ("vert", 7L, 2L)).toDF("key", "x", "y")
    val got = TheilSen.medianSlope(df, "key", "x", "y")
      .orderBy("k").as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      ("down", 2L, 1L, -9L, 3L, -3000000L),
      ("up", 3L, 3L, 10L, 1L, 10000000L)))
  }

  test("negative slope floors toward -inf in the fixed point") {
    val df = Seq(("k", 0L, 1L), ("k", 3L, 0L)).toDF("key", "x", "y")
    val got = TheilSen.medianSlope(df, "key", "x", "y")
      .select("slope_ppm").as[Long].head()
    assert(got == -333334L) // floor(-1e6/3), not trunc
  }

  test("hot-key guard fails with the contract's name") {
    val df = (0 until 20).map(i => ("k", i.toLong, i.toLong)).toDF("key", "x", "y")
    val e = intercept[Exception] {
      TheilSen.medianSlope(df, "key", "x", "y", maxPointsPerKey = 10L).collect()
    }
    assert(e.getMessage.contains("TheilSen.medianSlope"))
  }

  test("x-span contract (den <= 1e6) fails by name") {
    val df = Seq(("k", 0L, 0L), ("k", 2000000L, 5L)).toDF("key", "x", "y")
    val e = intercept[Exception] {
      TheilSen.medianSlope(df, "key", "x", "y").collect()
    }
    assert(e.getMessage.contains("x-span contract"))
  }

  test("theilsen_trend TVF round-trips the Scala path") {
    val df = Seq(("a", 0L, 0L), ("a", 1L, 3L), ("a", 2L, 4L)).toDF("key", "x", "y")
    df.createOrReplaceTempView("ts_pts")
    val tvf = spark.sql(
      "SELECT * FROM theilsen_trend('ts_pts', 'key', 'x', 'y')").collect().toSeq
    val direct = TheilSen.medianSlope(df, "key", "x", "y").collect().toSeq
    assert(tvf == direct)
  }
}
