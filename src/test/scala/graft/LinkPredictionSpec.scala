package graft

import graft.operators.LinkPrediction

class LinkPredictionSpec extends SparkSpec {
  init()
  import spark.implicits._

  // Two triangles sharing a path, a hub, and an isolated edge:
  //   1-2, 1-3, 2-3 (triangle), 3-4, 4-5, 3-5 (triangle), 2-4,
  //   hub 9: 9-1, 9-2, 9-3, 9-4, 9-5,  isolated 7-8
  private val edgeSeq = Seq(
    (1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L), (4L, 5L), (3L, 5L), (2L, 4L),
    (9L, 1L), (9L, 2L), (9L, 3L), (9L, 4L), (9L, 5L), (7L, 8L))
  private def edges = edgeSeq.toDF("a", "b")

  private def brute(minCommon: Int, cap: Int): Map[(Long, Long), (Long, Long, Long)] = {
    val und = edgeSeq.map { case (a, b) => (math.min(a, b), math.max(a, b)) }.toSet
    val nodes = und.flatMap { case (a, b) => Seq(a, b) }
    val nbr = nodes.map(v => v -> und.collect {
      case (a, b) if a == v => b
      case (a, b) if b == v => a
    }).toMap
    val deg = nbr.map { case (v, ns) => v -> ns.size.toLong }
    (for {
      x <- nodes.toSeq; y <- nodes.toSeq if x < y && !und.contains((x, y))
      common = (nbr(x) intersect nbr(y)).filter(z => deg(z) <= cap)
      if common.size >= minCommon
    } yield {
      val n = common.size.toLong
      val j = 10000L * n / (deg(x) + deg(y) - n)
      val ra = common.toSeq.map(z => 1000000L / deg(z)).sum
      (x, y) -> (n, j, ra)
    }).toMap
  }

  test("scores match the brute-force oracle on the fixture") {
    val got = LinkPrediction.scores(edges, minCommon = 1)
      .as[(Long, Long, Long, Long, Long)].collect()
      .map { case (x, y, n, j, r) => (x, y) -> (n, j, r) }.toMap
    assert(got == brute(minCommon = 1, cap = 10000))
  }

  test("minCommon filters and adjacent pairs never appear") {
    val got = LinkPrediction.scores(edges, minCommon = 2)
      .as[(Long, Long, Long, Long, Long)].collect()
    val und = edgeSeq.map { case (a, b) => (math.min(a, b), math.max(a, b)) }.toSet
    assert(got.forall(_._3 >= 2))
    assert(got.forall { case (x, y, _, _, _) => !und.contains((x, y)) })
    assert(got.map { case (x, y, n, j, r) => (x, y) -> (n, j, r) }.toMap ==
      brute(minCommon = 2, cap = 10000))
  }

  test("maxCenterDegree excludes hub-certified wedges but keeps full-graph degrees") {
    // cap 4 removes node 9 (degree 5) and node 3 (degree 5) as centers
    val got = LinkPrediction.scores(edges, minCommon = 1, maxCenterDegree = 4)
      .as[(Long, Long, Long, Long, Long)].collect()
      .map { case (x, y, n, j, r) => (x, y) -> (n, j, r) }.toMap
    assert(got == brute(minCommon = 1, cap = 4))
    // 1-4: common neighbors {2, 3, 9}; capped to {2}; deg(1)=3, deg(4)=4
    assert(got((1L, 4L)) == ((1L, 10000L * 1 / (3 + 4 - 1), 1000000L / 4)))
  }

  test("duplicate and reversed edges collapse; self-loops drop") {
    val noisy = (edgeSeq ++ edgeSeq.map(_.swap) ++ Seq((1L, 1L))).toDF("a", "b")
    val a = LinkPrediction.scores(edges, minCommon = 1).orderBy("x", "y").collect().toSeq
    val b = LinkPrediction.scores(noisy, minCommon = 1).orderBy("x", "y").collect().toSeq
    assert(a == b)
  }
}
