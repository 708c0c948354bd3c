package graft

import graft.operators.EffectiveSampleSize

class EffectiveSampleSizeSpec extends SparkSpec {
  init()
  import spark.implicits._

  private def run(rows: Seq[(String, Long)]): Map[String, (Long, Long, String, Long, Long)] =
    EffectiveSampleSize.perGroup(rows.toDF("g", "w"), Seq("g"), "w")
      .as[(String, Long, Long, String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap

  test("equal weights: ESS = n exactly, deff = 1 exactly") {
    val rows = (0 until 50).map(i => ("g", 7L))
    val got = run(rows)("g")
    assert(got == ((50L, 350L, "2450", 50000000L, 1000000L)))
  }

  test("one dominant weight collapses ESS toward 1") {
    val rows = ("g", 1000000000L) +: (0 until 99).map(_ => ("g", 1L))
    val (n, ws, wss, ess, deff) = run(rows)("g")
    assert(n == 100L && ws == 1000000099L && wss == "1000000000000000099")
    // ESS = (Σw)²/Σw² ≈ 1 -> between 1 and 2 at ppm scale
    assert(ess >= 1000000L && ess < 2000000L, s"ess_ppm=$ess")
    assert(deff > 90L * 1000000L, s"deff_ppm=$deff")
  }

  test("ten max-weight rows (sum(w^2) = 1e19 > BIGINT) now ship exactly") {
    // the round-13 ADVICE scenario: inputs inside the weight envelope
    // whose SQUARED sum exceeds 2^63 — must not overflow-cast
    val rows = (0 until 10).map(_ => ("g", 1000000000L))
    val (n, ws, wss, ess, deff) = run(rows)("g")
    assert(n == 10L && ws == 10000000000L)
    assert(wss == "10000000000000000000") // 1e19, past BIGINT
    assert(ess == 10000000L && deff == 1000000L) // equal weights
  }

  test("matches the BigInt replay per group; Cauchy-Schwarz floor holds") {
    val rows = (0 until 400).map(i => (s"g${i % 3}", (i % 9 + 1).toLong))
    val got = run(rows)
    rows.groupBy(_._1).foreach { case (g, grp) =>
      val n = BigInt(grp.size)
      val ws = BigInt(grp.map(_._2).sum)
      val wss = grp.map(r => BigInt(r._2) * r._2).sum
      val want = (n.toLong, ws.toLong, wss.toString,
        (BigInt(1000000) * ws * ws / wss).toLong,
        (BigInt(1000000) * n * wss / (ws * ws)).toLong)
      assert(got(g) == want, g)
      assert(got(g)._5 >= 1000000L - 1L) // deff >= 1 up to the floor
    }
  }

  test("effective_sample_size TVF round-trips the Scala path") {
    val rows = (0 until 400).map(i => (s"g${i % 3}", (i % 9 + 1).toLong))
    rows.toDF("g", "w").createOrReplaceTempView("ess_rows")
    val sqlDf = spark.sql("SELECT * FROM effective_sample_size('ess_rows', 'g', 'w')")
    val scalaDf = EffectiveSampleSize.perGroup(spark.table("ess_rows"), Seq("g"), "w")
    assert(sqlDf.columns.toSeq == scalaDf.columns.toSeq)
    assert(sqlDf.exceptAll(scalaDf).isEmpty && scalaDf.exceptAll(sqlDf).isEmpty)
  }

  test("weight contract fails by name") {
    val ex = intercept[Exception] {
      EffectiveSampleSize.perGroup(Seq(("g", 0L)).toDF("g", "w"), Seq("g"), "w").collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("EffectiveSampleSize")))
  }
}
