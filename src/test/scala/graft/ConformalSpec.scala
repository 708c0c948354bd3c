package graft

import graft.operators.Conformal

class ConformalSpec extends SparkSpec {
  init()
  import spark.implicits._

  private def run(cal: Seq[Long], test: Seq[Long], num: Long, den: Long)
      : (Long, Long, Long, Boolean, Long, Long, Long) =
    Conformal.calibrate(cal.toDF("s"), test.toDF("s"), "s", num, den)
      .as[(Long, Long, Long, Boolean, Long, Long, Long)].head()

  test("hand case: n=9, alpha=1/10 -> k=9, threshold = the max, full coverage") {
    val cal = (1L to 9L)
    // k = ceil(10 * 9/10) = 9 -> q_hat = 9; kRaw = 9 <= 9 so exact
    val got = run(cal, Seq(3L, 9L, 10L), 1, 10)
    assert(got == ((9L, 9L, 9L, true, 3L, 2L, 666666L)))
  }

  test("k clamps at n when the requested confidence is unreachable") {
    // n=4, alpha=1/10: kRaw = ceil(5*9/10) = 5 > 4 -> clamp, exact=false
    val got = run(Seq(10L, 20L, 30L, 40L), Seq(35L, 45L), 1, 10)
    assert(got._1 == 4L && got._2 == 4L && got._3 == 40L && !got._4)
    assert(got._6 == 1L && got._7 == 500000L)
  }

  test("guarantee holds empirically on an exchangeable split") {
    // calibration and test drawn from the same deterministic sequence:
    // realized coverage must be >= 1 - alpha - small-sample slack
    val all = (0 until 2000).map(i => ((i * 7919L) % 1000L))
    val cal = all.zipWithIndex.filter(_._2 % 2 == 0).map(_._1)
    val tst = all.zipWithIndex.filter(_._2 % 2 == 1).map(_._1)
    val got = run(cal, tst, 1, 10)
    assert(got._4, "n=1000 at alpha=1/10 must be exact")
    assert(got._7 >= 880000L, s"coverage ${got._7} below guarantee band")
  }

  test("matches a sort replay at several alphas; ties counted once per row") {
    val cal = (0 until 500).map(i => ((i * 13L) % 37L))
    val tst = (0 until 300).map(i => ((i * 17L) % 41L))
    for ((num, den) <- Seq((1L, 10L), (1L, 4L), (1L, 2L), (3L, 4L))) {
      val n = cal.size
      val kRaw = ((n + 1) * (den - num) + den - 1) / den
      val k = math.min(kRaw, n).toInt
      val qHat = cal.sorted.apply(k - 1)
      val covered = tst.count(_ <= qHat).toLong
      val got = run(cal, tst, num, den)
      assert(got == ((n.toLong, k.toLong, qHat, kRaw <= n, tst.size.toLong,
        covered, 1000000L * covered / tst.size)), s"alpha=$num/$den")
    }
  }

  test("conformal_calibrate TVF round-trips the Scala path") {
    val cal = (0 until 500).map(i => ((i * 13L) % 37L))
    val tst = (0 until 300).map(i => ((i * 17L) % 41L))
    cal.toDF("s").createOrReplaceTempView("conf_cal")
    tst.toDF("s").createOrReplaceTempView("conf_tst")
    val sqlDf = spark.sql(
      "SELECT * FROM conformal_calibrate('conf_cal', 'conf_tst', 's', 1, 10)")
    val scalaDf = Conformal.calibrate(
      spark.table("conf_cal"), spark.table("conf_tst"), "s", 1, 10)
    assert(sqlDf.columns.toSeq == scalaDf.columns.toSeq)
    assert(sqlDf.exceptAll(scalaDf).isEmpty && scalaDf.exceptAll(sqlDf).isEmpty)
  }

  test("bad alpha and empty calibration fail by name") {
    intercept[IllegalArgumentException] {
      Conformal.calibrate(Seq(1L).toDF("s"), Seq(1L).toDF("s"), "s", 10, 10)
    }
    val ex = intercept[IllegalArgumentException] {
      Conformal.calibrate(Seq.empty[Long].toDF("s"), Seq(1L).toDF("s"), "s", 1, 10)
    }
    assert(ex.getMessage.contains("empty calibration"))
  }
}
