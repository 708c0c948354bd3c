package graft

import graft.operators.QuantileSketch

class QuantileSketchSpec extends SparkSpec {
  init()
  import spark.implicits._

  private def rows = (0 until 300).map { i =>
    (if (i % 2 == 0) "even" else "odd", i.toLong, (i * 37 % 101).toLong)
  }
  private def df = rows.toDF("g", "id", "v")

  test("merge law: sketches of disjoint parts merge to the sketch of the whole") {
    val parts = Seq(
      rows.filter(_._2 % 3 == 0), rows.filter(_._2 % 3 == 1), rows.filter(_._2 % 3 == 2))
      .map(_.toDF("g", "id", "v"))
    val k = 32
    val merged = QuantileSketch.merge(
      QuantileSketch.merge(
        QuantileSketch.build(parts(0), Seq("g"), "id", "v", k),
        QuantileSketch.build(parts(1), Seq("g"), "id", "v", k), Seq("g"), k),
      QuantileSketch.build(parts(2), Seq("g"), "id", "v", k), Seq("g"), k)
    val whole = QuantileSketch.build(df, Seq("g"), "id", "v", k)
    assert(
      merged.orderBy("g", "hkey").collect().toSeq ==
        whole.orderBy("g", "hkey").collect().toSeq)
  }

  test("deterministic: two builds produce identical sketches") {
    val a = QuantileSketch.build(df, Seq("g"), "id", "v", 16)
      .orderBy("g", "hkey").collect().toSeq
    val b = QuantileSketch.build(df.repartition(7), Seq("g"), "id", "v", 16)
      .orderBy("g", "hkey").collect().toSeq
    assert(a == b)
  }

  test("with k >= group size the estimates ARE percentile_disc") {
    val sk = QuantileSketch.build(df, Seq("g"), "id", "v", k = 1000)
    val got = QuantileSketch.quantiles(sk, Seq("g"), Seq((1L, 2L), (9L, 10L)))
      .orderBy("g", "q_num").as[(String, Long, Long, Long, Long)].collect().toSeq
    def exact(g: String, q: Double): Long = {
      val vs = rows.filter(_._1 == g).map(_._3).sorted
      vs(math.max(1, math.ceil(q * vs.size).toInt) - 1)
    }
    assert(got == Seq(
      ("even", 1L, 2L, 150L, exact("even", 0.5)),
      ("even", 9L, 10L, 150L, exact("even", 0.9)),
      ("odd", 1L, 2L, 150L, exact("odd", 0.5)),
      ("odd", 9L, 10L, 150L, exact("odd", 0.9))))
  }

  test("sampled estimate lands within the uniform-sample rank band") {
    // k = 64 of 150 per group: allow ±25 rank points (±~3/sqrt(64) = 37%
    // would be the 3-sigma bound; the fixed fixture sits well inside)
    val sk = QuantileSketch.build(df, Seq("g"), "id", "v", k = 64)
    val got = QuantileSketch.quantiles(sk, Seq("g"), Seq((1L, 2L)))
      .as[(String, Long, Long, Long, Long)].collect()
    got.foreach { case (g, _, _, n, est) =>
      assert(n == 64L)
      val vs = rows.filter(_._1 == g).map(_._3).sorted
      val rank = vs.count(_ <= est).toDouble / vs.size
      assert(rank > 0.25 && rank < 0.75, s"$g: est=$est rank=$rank")
    }
  }

  test("sketch_quantiles TVF round-trips the Scala path") {
    df.createOrReplaceTempView("qs_rows")
    val tvf = spark.sql(
      "SELECT * FROM sketch_quantiles('qs_rows', 'g', 'id', 'v', 32, '1:2,9:10')")
      .orderBy("g", "q_num").collect().toSeq
    val direct = QuantileSketch.quantiles(
        QuantileSketch.build(df, Seq("g"), "id", "v", 32),
        Seq("g"), Seq((1L, 2L), (9L, 10L)))
      .orderBy("g", "q_num").collect().toSeq
    assert(tvf == direct)
  }
}
