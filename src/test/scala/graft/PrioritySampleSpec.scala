package graft

import graft.operators.PrioritySample

class PrioritySampleSpec extends SparkSpec {
  init()
  import spark.implicits._

  private def rows = (0 until 200).map { i =>
    ("g", i.toString, (i % 13 + 1).toLong * 10L)
  }
  private def df = rows.toDF("g", "id", "w")

  test("k >= n: every row sampled, estimates are the exact weights") {
    val sk = PrioritySample.sketch(df, Seq("g"), "id", "w", k = 500)
    val est = PrioritySample.estimates(sk, Seq("g"), k = 500)
      .as[(String, String, Long, String)].collect()
    assert(est.length == 200)
    assert(est.forall { case (_, _, w, e) => BigInt(e) == BigInt(w) * 1000000 })
  }

  test("merge law: sketches of disjoint parts merge to the whole's sketch") {
    val parts = Seq(rows.filter(_._2.toInt % 2 == 0), rows.filter(_._2.toInt % 2 == 1))
      .map(_.toDF("g", "id", "w"))
    val k = 24
    val merged = PrioritySample.merge(
      PrioritySample.sketch(parts(0), Seq("g"), "id", "w", k),
      PrioritySample.sketch(parts(1), Seq("g"), "id", "w", k), Seq("g"), k)
    val whole = PrioritySample.sketch(df, Seq("g"), "id", "w", k)
    assert(
      merged.orderBy("id").collect().toSeq == whole.orderBy("id").collect().toSeq)
  }

  test("deterministic under repartition") {
    val a = PrioritySample.sketch(df, Seq("g"), "id", "w", 16).orderBy("id").collect().toSeq
    val b = PrioritySample.sketch(df.repartition(9), Seq("g"), "id", "w", 16)
      .orderBy("id").collect().toSeq
    assert(a == b)
  }

  test("subset-sum estimator lands near the true total on the fixed fixture") {
    val trueTotal = rows.map(_._3).sum * BigDecimal(1000000)
    val sk = PrioritySample.sketch(df, Seq("g"), "id", "w", k = 64)
    val est = PrioritySample.estimates(sk, Seq("g"), k = 64)
      .agg(org.apache.spark.sql.functions.sum(
        org.apache.spark.sql.functions.col("est_ppm").cast("decimal(38,0)")))
      .as[BigDecimal].head()
    val ratio = (est / trueTotal).toDouble
    assert(ratio > 0.6 && ratio < 1.4, s"estimator total off: $ratio")
  }

  test("weight contract fails by name") {
    val bad = Seq(("g", "x", 0L)).toDF("g", "id", "w")
    val e = intercept[Exception] {
      PrioritySample.sketch(bad, Seq("g"), "id", "w", 4).collect()
    }
    assert(e.getMessage.contains("PrioritySample"))
  }

  test("priority_sample TVF round-trips the Scala path") {
    df.createOrReplaceTempView("ps_rows")
    val tvf = spark.sql(
      "SELECT * FROM priority_sample('ps_rows', 'g', 'id', 'w', 16)")
      .orderBy("id").collect().toSeq
    val direct = PrioritySample.estimates(
        PrioritySample.sketch(df, Seq("g"), "id", "w", 16), Seq("g"), 16)
      .orderBy("id").collect().toSeq
    assert(tvf == direct)
  }
}
