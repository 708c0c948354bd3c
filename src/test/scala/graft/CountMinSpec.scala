package graft

import org.apache.spark.sql.functions._

import graft.operators.CountMin

/** Count-min sketch guarantees under forced collisions (tiny width), the
  * no-lost-heavy-hitter property, and mergeability.
  */
class CountMinSpec extends SparkSpec {
  init()
  import spark.implicits._

  private def items(seq: Seq[String]) = seq.toDF("tok")

  // Zipf-ish multiset: tok0 ×64, tok1 ×32, ..., plus a long tail
  private val data: Seq[String] =
    (0 until 7).flatMap(i => Seq.fill(64 >> i)(s"tok$i")) ++
      (0 until 40).map(i => s"tail$i")

  test("estimates never undercount, even at width 16") {
    val df = items(data)
    val sk = CountMin.sketch(df, "tok", depth = 2, width = 16)
    val est = CountMin.estimate(df.distinct(), "tok", sk, depth = 2, width = 16)
      .as[(String, Long)].collect().toMap
    val exact = data.groupBy(identity).view.mapValues(_.size.toLong).toMap
    exact.foreach { case (tok, c) =>
      assert(est(tok) >= c, s"$tok undercounted: est=${est(tok)} exact=$c")
    }
  }

  test("no heavy hitter lost and exact column is exact") {
    val df = items(data)
    val thr = 16L
    val out = CountMin.heavyHitters(df, "tok", depth = 4, width = 32, threshold = lit(thr))
      .as[(String, Long, Long)].collect()
    val exact = data.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val trueHeavy = exact.filter(_._2 >= thr).keySet
    assert(trueHeavy.subsetOf(out.map(_._1).toSet),
      s"lost heavy hitters: ${trueHeavy -- out.map(_._1).toSet}")
    out.foreach { case (tok, est, ex) =>
      assert(ex == exact(tok), s"$tok exact column wrong: $ex vs ${exact(tok)}")
      assert(est >= ex, s"$tok est < exact")
    }
  }

  test("sketches merge: sketch(a ++ b) == cellwise sum of the parts") {
    val (a, b) = data.splitAt(data.size / 2)
    val whole = CountMin.sketch(items(a ++ b), "tok", depth = 3, width = 64)
      .orderBy("r", "cell").as[(Int, Long, Long)].collect().toSeq
    val merged = CountMin.sketch(items(a), "tok", depth = 3, width = 64)
      .unionByName(CountMin.sketch(items(b), "tok", depth = 3, width = 64))
      .groupBy("r", "cell").agg(sum("cnt").as("cnt"))
      .orderBy("r", "cell").as[(Int, Long, Long)].collect().toSeq
    assert(whole == merged)
  }

  test("cms_heavy_hitters TVF round-trips the Scala path") {
    items(data).createOrReplaceTempView("cms_items")
    val viaSql = spark.sql(
      "SELECT * FROM cms_heavy_hitters('cms_items', 'tok', 4, 32, 16)")
      .orderBy("tok").collect().toSeq
    val viaScala = CountMin
      .heavyHitters(items(data), "tok", depth = 4, width = 32, threshold = lit(16L))
      .orderBy("tok").collect().toSeq
    assert(viaSql == viaScala)
    assert(viaScala.nonEmpty)
  }
}
