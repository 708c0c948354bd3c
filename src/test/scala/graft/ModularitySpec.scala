package graft

import graft.operators.Modularity

class ModularitySpec extends SparkSpec {
  init()
  import spark.implicits._

  private def run(edges: Seq[(Long, Long)], labels: Seq[(Long, String)])
      : (Map[String, (Long, Long, Long, Long)], Long) = {
    val out = Modularity.score(
      edges.toDF("a", "b"), labels.toDF("id", "label"))
      .as[(String, Long, Long, Long, Long, Long)].collect()
    (out.map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap, out.head._6)
  }

  private def brute(edges: Seq[(Long, Long)], labels: Map[Long, String])
      : (Map[String, (Long, Long, Long, Long)], Long) = {
    val e = edges.map(p => (math.min(p._1, p._2), math.max(p._1, p._2)))
      .filter(p => p._1 != p._2).distinct
    val m = BigInt(e.size)
    val deg = e.flatMap(p => Seq(p._1, p._2)).groupBy(identity).map { case (k, v) => k -> v.size }
    val byC = deg.keys.toSeq.groupBy(labels)
    val cells = byC.map { case (c, nodes) =>
      val ns = nodes.toSet
      val eIn = BigInt(e.count(p => ns(p._1) && ns(p._2) &&
        labels(p._1) == c && labels(p._2) == c))
      val dTot = BigInt(nodes.map(deg).sum)
      val num = 4 * m * eIn - dTot * dTot
      c -> ((nodes.size.toLong, eIn.toLong, dTot.toLong,
        (BigInt(1000000) * num / (4 * m * m)).toLong, num))
    }
    val q = (BigInt(1000000) * cells.values.map(_._5).sum / (4 * m * m)).toLong
    (cells.map { case (c, t) => c -> ((t._1, t._2, t._3, t._4)) }, q)
  }

  test("two clean cliques score high; the merged partition scores zero-ish") {
    // two triangles, one bridge edge
    val edges = Seq[(Long, Long)]((1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6), (3, 4))
    val goodLabels = Seq(1L -> "a", 2L -> "a", 3L -> "a", 4L -> "b", 5L -> "b", 6L -> "b")
    val (cells, q) = run(edges, goodLabels)
    assert(cells == brute(edges, goodLabels.toMap)._1)
    assert(q == brute(edges, goodLabels.toMap)._2)
    assert(q > 300000L, s"clean split must score high, got $q")
    // everything in ONE community: Q = e_c/m − 1 = 0 exactly
    val one = Seq(1L, 2L, 3L, 4L, 5L, 6L).map(_ -> "all")
    assert(run(edges, one)._2 == 0L)
  }

  test("matches the BigInt replay on a mixed random graph") {
    val edges = (0 until 120).map(i => ((i % 17).toLong, ((i * i + 3) % 19).toLong))
    val labels = (0L until 19L).map(n => n -> s"c${n % 4}")
    val got = run(edges, labels)
    assert(got == brute(edges, labels.toMap))
  }

  test("modularity TVF round-trips the Scala path") {
    val edges = (0 until 120).map(i => ((i % 17).toLong, ((i * i + 3) % 19).toLong))
    val labels = (0L until 19L).map(n => n -> s"c${n % 4}")
    edges.toDF("a", "b").createOrReplaceTempView("mod_edges")
    labels.toDF("id", "label").createOrReplaceTempView("mod_labels")
    val sqlDf = spark.sql("SELECT * FROM modularity('mod_edges', 'mod_labels')")
    val scalaDf = Modularity.score(spark.table("mod_edges"), spark.table("mod_labels"))
    assert(sqlDf.columns.toSeq == scalaDf.columns.toSeq)
    assert(sqlDf.exceptAll(scalaDf).isEmpty && scalaDf.exceptAll(sqlDf).isEmpty)
  }

  test("an unlabeled endpoint fails by name; deterministic under repartition") {
    val edges = Seq[(Long, Long)]((1, 2), (2, 3))
    val ex = intercept[Exception] {
      Modularity.score(edges.toDF("a", "b"), Seq(1L -> "a", 2L -> "a").toDF("id", "label"))
        .collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("without a label")))
    val big = (0 until 200).map(i => ((i % 13).toLong, ((i * 7) % 17).toLong))
    val lab = (0L until 17L).map(n => n -> s"g${n % 3}")
    val x = Modularity.score(big.toDF("a", "b"), lab.toDF("id", "label"))
      .orderBy("label").collect().toSeq
    val y = Modularity.score(big.toDF("a", "b").repartition(9), lab.toDF("id", "label"))
      .orderBy("label").collect().toSeq
    assert(x == y)
  }
}
