package graft

import org.apache.spark.sql.functions._

import graft.operators.{KCore, PageRank, Reachability}

class GraphOpsSpec extends SparkSpec {
  init()
  import spark.implicits._

  private def undirected(pairs: Seq[(Long, Long)]) =
    (pairs ++ pairs.map(p => (p._2, p._1))).toDF("a", "b")

  /** Run-to-fixpoint brute k-core. */
  private def bruteCore(nodes: Seq[Long], pairs: Seq[(Long, Long)], k: Int): Map[Long, Int] = {
    val adj = (pairs ++ pairs.map(p => (p._2, p._1)))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    var s = nodes.toSet
    var changed = true
    while (changed) {
      val keep = s.filter(v => adj.getOrElse(v, Seq.empty).count(s) >= k)
      changed = keep != s
      s = keep
    }
    s.map(v => v -> adj.getOrElse(v, Seq.empty).count(s)).toMap
  }

  /** Run-to-fixpoint brute BFS hops. */
  private def bruteBfs(nodes: Seq[Long], pairs: Seq[(Long, Long)], src: Long): Map[Long, Long] = {
    val adj = (pairs ++ pairs.map(p => (p._2, p._1)))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    var dist = Map(src -> 0L)
    var frontier = Set(src)
    var level = 0L
    while (frontier.nonEmpty) {
      level += 1
      val next = frontier.flatMap(v => adj.getOrElse(v, Seq.empty))
        .filterNot(dist.contains)
      next.foreach(v => dist += v -> level)
      frontier = next
    }
    nodes.map(v => v -> dist.getOrElse(v, -1L)).toMap
  }

  // triangle+tail: {1,2,3} is a 2-core; 4 hangs off it; 5-6 an isolated edge
  private val pairs = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (5L, 6L))
  private val nodes = (1L to 7L)

  test("k-core equals the fixpoint brute force once rounds cover the peel depth") {
    for (k <- Seq(1, 2, 3)) {
      val got = KCore.core(nodes.toDF("id"), undirected(pairs), k, rounds = 5)
        .as[(Long, Long)].collect().toMap
      val want = bruteCore(nodes, pairs, k).map { case (v, d) => v -> d.toLong }
      assert(got == want, s"k=$k: got $got want $want")
    }
    // k=2 keeps exactly the triangle (4's degree drops to 1 after nothing
    // — it never had 2), isolated edge goes at k=2
    val c2 = KCore.core(nodes.toDF("id"), undirected(pairs), 2, rounds = 5)
      .as[(Long, Long)].collect().toMap
    assert(c2.keySet == Set(1L, 2L, 3L))
  }

  test("BFS hop distances equal the fixpoint brute force; -1 beyond the horizon") {
    val got = Reachability.hopDistances(nodes.toDF("id"), undirected(pairs), 1L, rounds = 6)
      .as[(Long, Long)].collect().toMap
    assert(got == bruteBfs(nodes, pairs, 1L))
    assert(got(4L) == 2L && got(5L) == -1L && got(7L) == -1L)
    // a rounds horizon cuts the frontier exactly there
    val r1 = Reachability.hopDistances(nodes.toDF("id"), undirected(pairs), 1L, rounds = 1)
      .as[(Long, Long)].collect().toMap
    assert(r1(2L) == 1L && r1(3L) == 1L && r1(4L) == -1L)
  }

  test("personalized ranks: mass only reachable from sources, sources dominate") {
    val ppr = PageRank.personalizedRanks(
        nodes.toDF("id"), undirected(pairs), Seq(1L).toDF("id"), iters = 3)
      .as[(Long, Long)].collect().toMap
    // unreachable nodes hold exactly zero
    assert(ppr(5L) == 0L && ppr(6L) == 0L && ppr(7L) == 0L)
    // the source outranks its neighbors, neighbors outrank the tail
    assert(ppr(1L) > ppr(2L) && ppr(2L) > ppr(4L) && ppr(4L) > 0L)
    // uniform sources over ALL nodes degrade to classic PageRank
    val uni = PageRank.personalizedRanks(
        nodes.toDF("id"), undirected(pairs), nodes.toDF("id"), iters = 2)
      .as[(Long, Long)].collect().toMap
    val classic = PageRank.ranks(nodes.toDF("id"), undirected(pairs), iters = 2)
      .as[(Long, Long)].collect().toMap
    assert(uni == classic)
  }
}
