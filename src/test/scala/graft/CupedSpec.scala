package graft

import graft.operators.Cuped

class CupedSpec extends SparkSpec {
  init()
  import spark.implicits._

  private val units = (0 until 120).map { i =>
    val x = (i % 10).toLong
    val y = 3L * x + (i % 7).toLong
    ((i % 2).toString, x, y)
  }
  private def df = units.toDF("arm", "x", "y")

  // BigInt replay of the operator's documented formulas
  private def brute: Map[String, (Long, Long, Long, Long, Long)] = {
    def tdiv(a: BigInt, b: BigInt): BigInt = a / b // BigInt / truncates toward zero
    val n = BigInt(units.size)
    val sx = BigInt(units.map(_._2).sum)
    val sy = BigInt(units.map(_._3).sum)
    val sxx = units.map(u => BigInt(u._2) * u._2).sum
    val sxy = units.map(u => BigInt(u._2) * u._3).sum
    val den = n * sxx - sx * sx
    val theta = if (den == 0) BigInt(0) else tdiv(BigInt(1000000) * (n * sxy - sx * sy), den)
    units.groupBy(_._1).map { case (arm, us) =>
      val na = BigInt(us.size)
      val sxa = BigInt(us.map(_._2).sum)
      val sya = BigInt(us.map(_._3).sum)
      val sxxa = us.map(u => BigInt(u._2) * u._2).sum
      val sxya = us.map(u => BigInt(u._2) * u._3).sum
      val syya = us.map(u => BigInt(u._3) * u._3).sum
      val meanY = tdiv(BigInt(1000000) * sya, na)
      val meanCup = meanY - tdiv(theta * (n * sxa - na * sx), na * n)
      val ca = na * sxya - sxa * sya
      val vxa = na * sxxa - sxa * sxa
      val vya = na * syya - sya * sya
      val varred =
        if (vya == 0) BigInt(0)
        else tdiv(
          BigInt(10000) * (BigInt(2) * theta * ca * 1000000 - theta * theta * vxa),
          vya * BigInt("1000000000000"))
      arm -> ((us.size.toLong, theta.toLong, meanY.toLong, meanCup.toLong, varred.toLong))
    }
  }

  test("matches the BigInt replay of the documented formulas") {
    val got = Cuped.adjust(df, "arm", "x", "y")
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map { case (a, nn, t, m, mc, v) => a -> ((nn, t, m, mc, v)) }.toMap
    assert(got == brute)
  }

  test("y perfectly linear in x: variance reduction near total, adjusted means converge") {
    val lin = (0 until 100).map(i => ((i % 2).toString, (i % 11).toLong, 5L * (i % 11)))
    val got = Cuped.adjust(lin.toDF("arm", "x", "y"), "arm", "x", "y")
      .as[(String, Long, Long, Long, Long, Long)].collect()
    // theta = 5e6 exactly; residual variance 0 -> varred_bp = 10000
    assert(got.forall(_._3 == 5000000L))
    assert(got.forall(_._6 == 10000L))
  }

  test("constant covariate: theta = 0, adjusted mean = raw mean, no reduction") {
    val const = (0 until 60).map(i => ((i % 2).toString, 7L, (i % 5).toLong))
    val got = Cuped.adjust(const.toDF("arm", "x", "y"), "arm", "x", "y")
      .as[(String, Long, Long, Long, Long, Long)].collect()
    assert(got.forall(r => r._3 == 0L && r._4 == r._5 && r._6 == 0L))
  }

  test("deterministic under repartition") {
    val a = Cuped.adjust(df, "arm", "x", "y").orderBy("arm").collect().toSeq
    val b = Cuped.adjust(df.repartition(13), "arm", "x", "y").orderBy("arm").collect().toSeq
    assert(a == b)
  }
}
