package graft

import graft.operators.PageRank

/** Integer PageRank semantics: hand-computed 1-round values, hub
  * dominance after convergence-ish rounds, isolated-node floor, and
  * determinism across partitionings.
  */
class PageRankSpec extends SparkSpec {
  init()
  import spark.implicits._

  private val scale = 1000000L

  test("one round on a hand-computed star") {
    // star: 1↔2, 1↔3 (symmetric). outdeg: 1→2, 2→1, 3→1.
    // r0 = 10^6 each. contribs into 1: from 2 (10^6/1) + from 3 (10^6/1) = 2*10^6
    // r1(1) = 150000 + 85*2e6/100 = 150000 + 1700000 = 1850000
    // into 2: from 1: 10^6/2 = 500000 → r1(2) = 150000 + 425000 = 575000
    val nodes = Seq(1L, 2L, 3L, 4L).toDF("id") // 4 isolated
    val edges = Seq((1L, 2L), (2L, 1L), (1L, 3L), (3L, 1L)).toDF("a", "b")
    val got = PageRank.ranks(nodes, edges, iters = 1, scale = scale)
      .orderBy("id").as[(Long, Long)].collect().toSeq
    assert(got == Seq(
      (1L, 1850000L), (2L, 575000L), (3L, 575000L), (4L, 150000L)))
  }

  test("hub outranks leaves and isolated nodes after 3 rounds") {
    val nodes = (1L to 6L).toDF("id")
    val pairs = Seq((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L))
    val edges = (pairs ++ pairs.map(_.swap)).toDF("a", "b")
    val r = PageRank.ranks(nodes, edges, iters = 3, scale = scale)
      .as[(Long, Long)].collect().toMap
    assert(r(1L) > r(2L), s"hub must outrank leaf: $r")
    assert(r(2L) > r(6L), s"leaf must outrank isolated: $r")
    assert(Seq(2L, 3L, 4L, 5L).map(r).distinct.size == 1, "symmetric leaves equal")
  }

  test("deterministic across partition counts") {
    val nodes = (1L to 20L).toDF("id").repartition(7)
    val pairs = (1L to 19L).map(i => (i, i + 1))
    val edges = (pairs ++ pairs.map(_.swap)).toDF("a", "b").repartition(5)
    val a = PageRank.ranks(nodes, edges, 2, scale).orderBy("id").collect().toSeq
    val b = PageRank.ranks(nodes.coalesce(1), edges.coalesce(1), 2, scale)
      .orderBy("id").collect().toSeq
    assert(a == b)
  }
}
