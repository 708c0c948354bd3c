package graft

import graft.operators.Truss

class TrussSpec extends SparkSpec {
  init()
  import spark.implicits._

  private def run(edges: Seq[(Long, Long)], k: Int, rounds: Int)
      : Set[(Long, Long, Long)] =
    Truss.peel(edges.toDF("a", "b"), k, rounds)
      .as[(Long, Long, Long)].collect().toSet

  /** Run-to-fixpoint brute force (the true k-truss). */
  private def brute(edges: Seq[(Long, Long)], k: Int): Set[(Long, Long, Long)] = {
    var e = edges.map(p => (math.min(p._1, p._2), math.max(p._1, p._2)))
      .filter(p => p._1 != p._2).distinct.toSet
    def support(s: Set[(Long, Long)]): Map[(Long, Long), Long] = {
      val adj = s.toSeq.flatMap(p => Seq(p, p.swap)).groupBy(_._1)
        .map { case (v, ps) => v -> ps.map(_._2).toSet }
      s.map { case (a, b) =>
        (a, b) -> (adj.getOrElse(a, Set.empty) & adj.getOrElse(b, Set.empty)).size.toLong
      }.toMap
    }
    var changed = true
    while (changed) {
      val sup = support(e)
      val next = e.filter(p => sup(p) >= k - 2)
      changed = next != e
      e = next
    }
    val fin = support(e)
    e.map(p => (p._1, p._2, fin(p)))
  }

  test("a clique survives whole; pendant chains and lone triangles peel at k=5") {
    // K5 (every edge support 3) + a chain + a lone triangle
    val k5 = for (i <- 1L to 5L; j <- i + 1 to 5L) yield (i, j)
    val chain = Seq((5L, 10L), (10L, 11L), (11L, 12L))
    val tri = Seq((20L, 21L), (21L, 22L), (20L, 22L))
    val got = run(k5 ++ chain ++ tri, k = 5, rounds = 3)
    assert(got == brute(k5 ++ chain ++ tri, 5))
    assert(got.map(t => (t._1, t._2)) == k5.toSet)
    assert(got.forall(_._3 == 3L))
  }

  test("cascade: removing weak edges peels previously supported ones (needs >1 round)") {
    // two triangles sharing an edge: (1,2,3) and (2,3,4) — every edge has
    // support >= 1, the shared (2,3) has 2; at k=4 round 1 removes the four
    // outer edges (support 1), round 2 removes (2,3) (support now 0)
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L))
    assert(run(edges, k = 4, rounds = 3) == Set.empty)
    assert(brute(edges, 4) == Set.empty)
    // but the 1-round prefix still contains the shared edge
    assert(run(edges, k = 4, rounds = 1).map(t => (t._1, t._2)) == Set((2L, 3L)))
  }

  test("matches the fixpoint brute force on a mixed random graph") {
    val edges = (0 until 150).map(i => ((i % 17).toLong, ((i * i + 3) % 23).toLong))
    for (k <- Seq(3, 4, 5)) {
      assert(run(edges, k, rounds = 6) == brute(edges, k), s"k=$k")
    }
  }

  test("bad k/rounds fail by name; deterministic under repartition") {
    intercept[IllegalArgumentException] {
      Truss.peel(Seq((1L, 2L)).toDF("a", "b"), k = 2, rounds = 1)
    }
    val edges = (0 until 120).map(i => ((i % 13).toLong, ((i * 7 + 1) % 19).toLong))
    val x = Truss.peel(edges.toDF("a", "b"), 4, 3).orderBy("a", "b").collect().toSeq
    val y = Truss.peel(edges.toDF("a", "b").repartition(9), 4, 3)
      .orderBy("a", "b").collect().toSeq
    assert(x == y)
  }

  test("ktruss TVF round-trips the Scala path") {
    val edges = (0 until 150).map(i => ((i % 17).toLong, ((i * i + 3) % 23).toLong))
    edges.toDF("a", "b").createOrReplaceTempView("truss_edges")
    val sqlDf = spark.sql("SELECT * FROM ktruss('truss_edges', 4, 3)")
    val scalaDf = Truss.peel(spark.table("truss_edges"), 4, 3)
    assert(sqlDf.columns.toSeq == scalaDf.columns.toSeq)
    assert(sqlDf.exceptAll(scalaDf).isEmpty && scalaDf.exceptAll(sqlDf).isEmpty)
  }
}
