package graft

import graft.operators.SweepCut

class SweepCutSpec extends SparkSpec {
  init()
  import spark.implicits._

  private def run(
      scores: Seq[(Long, Long)],
      edges: Seq[(Long, Long)],
      m: Int): Seq[(Long, Long, Long, Long, Long, Long, Long, Long)] =
    SweepCut.sweep(scores.toDF("id", "score"), edges.toDF("a", "b"), m)
      .orderBy("rank")
      .as[(Long, Long, Long, Long, Long, Long, Long, Long)].collect().toSeq

  private def brute(
      scores: Map[Long, Long],
      edges: Seq[(Long, Long)],
      m: Int): Seq[(Long, Long, Long, Long, Long, Long, Long, Long)] = {
    val e = edges.map(p => (math.min(p._1, p._2), math.max(p._1, p._2)))
      .filter(p => p._1 != p._2).distinct
    val deg = e.flatMap(p => Seq(p._1, p._2)).groupBy(identity)
      .map { case (k, v) => k -> v.size.toLong }
    val tot = 2L * e.size
    val ranked = deg.keys.toSeq
      .filter(v => scores.getOrElse(v, 0L) > 0)
      .sortBy(v => (-(BigInt(scores(v)) * BigInt(10).pow(12) / deg(v)), v))
      .take(m)
    val rankOf = ranked.zipWithIndex.map { case (v, i) => v -> (i + 1L) }.toMap
    var vol = 0L
    var ein = 0L
    val rows = ranked.zipWithIndex.map { case (v, i) =>
      vol += deg(v)
      ein += e.count(p => rankOf.contains(p._1) && rankOf.contains(p._2) &&
        math.max(rankOf(p._1), rankOf(p._2)) == i + 1)
      val cut = vol - 2 * ein
      val mn = math.min(vol, tot - vol)
      val cond = if (mn == 0) 1000000L else 1000000L * cut / mn
      (i + 1L, v, scores(v), deg(v), vol, cut, cond)
    }
    val best = rows.minBy(r => (r._7, r._1))._1
    rows.map(r => (r._1, r._2, r._3, r._4, r._5, r._6, r._7, best))
  }

  test("the sweep finds the planted community boundary") {
    // clique {1..5} + clique {10..14}, one bridge; high scores on clique 1
    val c1 = for (i <- 1L to 5L; j <- i + 1 to 5L) yield (i, j)
    val c2 = for (i <- 10L to 14L; j <- i + 1 to 14L) yield (i, j)
    val edges = c1 ++ c2 :+ ((5L, 10L))
    val scores = (1L to 5L).map(v => v -> (100L - v)) ++
      (10L to 14L).map(v => v -> 2L)
    val got = run(scores, edges, 20)
    assert(got == brute(scores.toMap, edges, 20))
    // the best prefix is exactly clique 1 (rank 5): one bridge edge cut
    val best = got.head._8
    assert(best == 5L, s"expected the clique boundary at rank 5, got $best")
    assert(got.filter(_._1 <= best).map(_._2).toSet == (1L to 5L).toSet)
    // conductance at the boundary: cut 1, vol 21 -> 47619 ppm
    assert(got(4)._7 == 1000000L / 21)
  }

  test("matches the BigInt replay on a mixed random graph") {
    val edges = (0 until 200).map(i => ((i % 19).toLong, ((i * i + 5) % 23).toLong))
    val scores = (0L until 23L).map(v => v -> ((v * 37) % 11))
    val got = run(scores, edges, 15)
    assert(got == brute(scores.toMap, edges, 15))
    assert(got.size <= 15)
  }

  test("zero-score and isolated nodes never rank; negative scores fail by name") {
    val edges = Seq((1L, 2L), (2L, 3L))
    val got = run(Seq(1L -> 5L, 2L -> 0L, 99L -> 7L), edges, 10)
    assert(got.map(_._2) == Seq(1L)) // 2 has score 0; 99 is isolated
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    val ex = intercept[Exception] { run(Seq(1L -> -1L), edges, 10) }
    assert(msgs(ex).exists(_.contains("scores must be >= 0")))
  }

  test("sweep_cut TVF round-trips the Scala path") {
    val edges = (0 until 200).map(i => ((i % 19).toLong, ((i * i + 5) % 23).toLong))
    val scores = (0L until 23L).map(v => v -> ((v * 37) % 11))
    scores.toDF("id", "score").createOrReplaceTempView("sc_scores")
    edges.toDF("a", "b").createOrReplaceTempView("sc_edges")
    val sqlDf = spark.sql("SELECT * FROM sweep_cut('sc_scores', 'sc_edges', 15)")
    val scalaDf = SweepCut.sweep(
      spark.table("sc_scores"), spark.table("sc_edges"), 15)
    assert(sqlDf.columns.toSeq == scalaDf.columns.toSeq)
    assert(sqlDf.exceptAll(scalaDf).isEmpty && scalaDf.exceptAll(sqlDf).isEmpty)
  }
}
