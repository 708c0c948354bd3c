package graft

import graft.operators.GraphStats

class GraphStatsSpec extends SparkSpec {
  init()
  import spark.implicits._

  private def run(edges: Seq[(Long, Long)]): (Long, Long, Long, Long, Long) =
    GraphStats.assortativity(edges.toDF("a", "b"))
      .as[(Long, Long, Long, Long, Long)].head()

  private def bruteR(edges: Seq[(Long, Long)]): Long = {
    val und = edges.map(p => (math.min(p._1, p._2), math.max(p._1, p._2)))
      .filter(p => p._1 != p._2).distinct
    val deg = und.flatMap(p => Seq(p._1, p._2)).groupBy(identity)
      .map { case (v, o) => v -> BigInt(o.size) }
    val dirs = und.flatMap(p => Seq(p, p.swap))
    val m = BigInt(dirs.size)
    val sx = dirs.map(p => deg(p._1)).sum
    val sxx = dirs.map(p => deg(p._1) * deg(p._1)).sum
    val sxy = dirs.map(p => deg(p._1) * deg(p._2)).sum
    val den = m * sxx - sx * sx
    if (den == 0) 0L else ((BigInt(1000000) * (m * sxy - sx * sx)) / den).toLong
  }

  test("star graph is maximally disassortative; regular ring reports 0 by convention") {
    val star = (1L to 8L).map(i => (0L, i))
    val (n, e, maxd, d2, r) = run(star)
    assert((n, e, maxd) == ((9L, 8L, 8L)))
    assert(d2 == 64L + 8L)
    assert(r == bruteR(star) && r < -900000L) // near -1e6
    val ring = (0L until 10L).map(i => (i, (i + 1) % 10))
    val rr = run(ring)
    assert(rr._5 == 0L) // zero degree variance
  }

  test("matches the BigInt replay on a mixed graph and ignores noise edges") {
    val edges = Seq[(Long, Long)](
      (1, 2), (2, 3), (3, 4), (4, 1), (1, 3), (5, 1), (6, 1), (7, 2),
      (2, 1), (1, 1)) // reversed dup + self loop
    val got = run(edges)
    assert(got._5 == bruteR(edges))
    val bigger = (0 until 300).map(i => ((i % 23).toLong, ((i * 7) % 31 + 5).toLong))
    assert(run(bigger)._5 == bruteR(bigger))
  }
}
