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

  private def runNorm(edges: Seq[(Long, Long)], iters: Int)
      : Map[Long, (Long, Long)] =
    Hits.normalizedScores(edges.toDF("src", "dst"), iters)
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap

  private def bruteNorm(edges: Seq[(Long, Long)], iters: Int)
      : Map[Long, (Long, Long)] = {
    val scale = BigInt(1000000)
    val e = edges.filter(p => p._1 != p._2).distinct
    val nodes = e.flatMap(p => Seq(p._1, p._2)).distinct
    var h = nodes.map(_ -> scale).toMap
    var a = nodes.map(_ -> BigInt(0)).toMap
    for (_ <- 1 to iters) {
      val ar = nodes.map(n => n -> e.filter(_._2 == n).map(p => h(p._1)).sum).toMap
      val am = ar.values.max
      a = nodes.map(n => n -> (if (am == 0) BigInt(0) else ar(n) * scale / am)).toMap
      val hr = nodes.map(n => n -> e.filter(_._1 == n).map(p => a(p._2)).sum).toMap
      val hm = hr.values.max
      h = nodes.map(n => n -> (if (hm == 0) BigInt(0) else hr(n) * scale / hm)).toMap
    }
    nodes.map(n => n -> ((a(n).toLong, h(n).toLong))).toMap
  }

  test("normalized scores match the BigInt replay at several depths") {
    val edges = (0 until 60).map(i => ((i % 9).toLong, ((i * i + 1) % 11 + 20).toLong))
    assert(runNorm(edges, 1) == bruteNorm(edges, 1))
    assert(runNorm(edges, 4) == bruteNorm(edges, 4))
    assert(runNorm(edges, 7) == bruteNorm(edges, 7))
  }

  test("normalized iteration CONVERGES: an exact integer fixed point, top at scale") {
    // the q132-PPR-style convergence pin: by round 8 the ppm walk has
    // landed on its eigenvector exactly — one more round changes nothing
    val star = Seq[(Long, Long)]((1, 10), (1, 11), (2, 10), (3, 10))
    val at8 = runNorm(star, 8)
    assert(at8 == runNorm(star, 9))
    // L∞-normalized eigenvector of the star, floor-exact:
    // auth(11) = floor(10^6·(√2−1)), hub(2) = floor(10^6/√2)
    assert(at8(10L)._1 == 1000000L && at8(11L)._1 == 414213L)
    assert(at8(1L)._2 == 1000000L && at8(2L)._2 == 707107L)
    val mixed = (0 until 60).map(i => ((i % 9).toLong, ((i * i + 1) % 11 + 20).toLong))
    assert(runNorm(mixed, 8) == runNorm(mixed, 9))
  }

  test("hits_converged TVF round-trips the Scala path") {
    val edges = (0 until 60).map(i => ((i % 9).toLong, ((i * i + 1) % 11 + 20).toLong))
    edges.toDF("src", "dst").createOrReplaceTempView("hits_edges")
    val sqlDf = spark.sql("SELECT * FROM hits_converged('hits_edges', 6)")
    val scalaDf = Hits.normalizedScores(spark.table("hits_edges"), 6)
    assert(sqlDf.columns.toSeq == scalaDf.columns.toSeq)
    assert(sqlDf.exceptAll(scalaDf).isEmpty && scalaDf.exceptAll(sqlDf).isEmpty)
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
