package graft

import graft.operators.Hits

class HitsSpec extends SparkSpec {
  init()
  import spark.implicits._

  private def run(edges: Seq[(Long, Long)], iters: Int)
      : Map[Long, (BigInt, BigInt)] =
    Hits.scores(edges.toDF("src", "dst"), iters)
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> ((BigInt(r._2), BigInt(r._3)))).toMap

  private def brute(edges: Seq[(Long, Long)], iters: Int)
      : Map[Long, (BigInt, BigInt)] = {
    val e = edges.filter(p => p._1 != p._2).distinct
    val nodes = e.flatMap(p => Seq(p._1, p._2)).distinct
    var h = nodes.map(_ -> BigInt(1)).toMap
    var a = nodes.map(_ -> BigInt(0)).toMap
    for (_ <- 1 to iters) {
      a = nodes.map(n => n -> e.filter(_._2 == n).map(p => h(p._1)).sum).toMap
      h = nodes.map(n => n -> e.filter(_._1 == n).map(p => a(p._2)).sum).toMap
    }
    nodes.map(n => n -> ((a(n), h(n)))).toMap
  }

  test("bipartite fixture: the popular supplier is the authority, the broad buyer the hub") {
    // customers 1,2,3 -> suppliers 10,11; 1 buys both, supplier 10 bought by all
    val edges = Seq[(Long, Long)]((1, 10), (1, 11), (2, 10), (3, 10))
    val got = run(edges, 2)
    assert(got == brute(edges, 2))
    assert(got(10L)._1 > got(11L)._1) // 10 is the stronger authority
    assert(got(1L)._2 > got(2L)._2) // 1 is the stronger hub
    assert(got(10L)._2 == 0 && got(1L)._1 == 0) // pure sides stay pure
  }

  test("matches the unrolled recursion on a mixed directed graph") {
    val edges = (0 until 60).map(i => ((i % 9).toLong, ((i * i + 1) % 11 + 20).toLong))
    assert(run(edges, 2) == brute(edges, 2))
    assert(run(edges, 3) == brute(edges, 3))
  }

  test("duplicate and self edges are ignored; deterministic under repartition") {
    val edges = Seq[(Long, Long)]((1, 2), (1, 2), (2, 2), (2, 3))
    assert(run(edges, 2) == brute(edges, 2))
    val big = (0 until 200).map(i => ((i % 13).toLong, ((i * 7) % 17 + 30).toLong))
    val x = Hits.scores(big.toDF("src", "dst"), 2).orderBy("id").collect().toSeq
    val y = Hits.scores(big.toDF("src", "dst").repartition(9), 2)
      .orderBy("id").collect().toSeq
    assert(x == y)
  }
}
