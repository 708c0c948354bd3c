package graft

import graft.operators.ClickModels

class ClickModelsSpec extends SparkSpec {
  init()
  import spark.implicits._

  // pos 1: 2 of 4 clicked (500000 ppm); pos 2: 1 of 4 (250000 ppm);
  // pos 3: 0 of 2 (0 ppm)
  private def imps = Seq(
    ("a", 1L, 1L), ("a", 1L, 1L), ("a", 2L, 0L),
    ("b", 1L, 0L), ("b", 2L, 1L), ("b", 2L, 0L),
    ("c", 1L, 0L), ("c", 2L, 0L),
    ("z", 3L, 0L), ("z", 3L, 0L)).toDF("item", "pos", "clk")

  test("COEC corrects for position: exact ppm/bp arithmetic") {
    val got = ClickModels.coec(imps, "item", "pos", "clk")
      .orderBy("item").as[(String, Long, Long, Long, Option[Long])].collect().toSeq
    assert(got == Seq(
      // a: 2 clicks, expected 500000+500000+250000 → 10000*2e6 div 1.25e6
      ("a", 3L, 2L, 1250000L, Some(16000L)),
      // b: 1 click, expected 500000+250000+250000 → 1e10 div 1e6
      ("b", 3L, 1L, 1000000L, Some(10000L)),
      // c: 0 clicks, expected 750000 → 0
      ("c", 2L, 0L, 750000L, Some(0L)),
      // z: only zero-CTR positions → COEC undefined
      ("z", 2L, 0L, 0L, None)))
  }

  test("coec TVF round-trips the Scala path") {
    imps.createOrReplaceTempView("cm_imps")
    val tvf = spark.sql(
      "SELECT * FROM coec('cm_imps', 'item', 'pos', 'clk')")
      .orderBy("item").collect().toSeq
    val direct = ClickModels.coec(imps, "item", "pos", "clk")
      .orderBy("item").collect().toSeq
    assert(tvf == direct)
  }
}
