package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{PageRank, Triangles}

/** Scale-out behavior of the graph tier under replication + a planted
  * celebrity hub — the skew shape degree orientation exists for (a hub of
  * degree d contributes Θ(d²) wedges unoriented, but its ORIENTED
  * out-degree is bounded, so the wedge join stays O(m^1.5)).
  *
  * Replicating the edge set N× with disjoint id ranges gives exact output
  * identities (triangles scale exactly N×, per-replica PageRank values are
  * equal across replicas), so correctness at scale is asserted without
  * timing; the wall-time growth A/B for the same construction is recorded
  * in COVERAGE (timings don't belong in specs).
  */
class GraphScaleSpec extends SparkSpec {
  init()
  import spark.implicits._

  /** Deterministic base graph: ring + chords over `n` nodes. */
  private def baseEdges(n: Int): Seq[(Long, Long)] =
    (0 until n).flatMap { i =>
      Seq(
        (i.toLong, ((i + 1) % n).toLong), // ring
        (i.toLong, ((i + 2) % n).toLong)) // chord → triangles (i, i+1, i+2)
    }

  private def replicate(base: Seq[(Long, Long)], copies: Int, stride: Long): Seq[(Long, Long)] =
    (0 until copies).flatMap(c => base.map { case (a, b) => (a + c * stride, b + c * stride) })

  private def planOf(df: DataFrame): String = df.queryExecution.executedPlan.toString

  test("triangles: 10x replication + celebrity hub = exact count identity, no theta-join") {
    val n = 300
    val base = baseEdges(n)
    val baseCount = Triangles.enumerate(base.toDF("a", "b")).count()
    assert(baseCount == n.toLong) // one (i, i+1, i+2) triangle per node

    // 10 disjoint replicas + a hub adjacent to EVERY node of replica 0:
    // each replica keeps its n triangles; the hub closes one extra
    // triangle per replica-0 edge (hub, a, b)
    val hub = 1000000L
    val replicated = replicate(base, 10, stride = 1000) ++
      (0 until n).map(i => (hub, i.toLong))
    val distinctBaseEdges = base
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.distinct.size
    val tri = Triangles.enumerate(replicated.toDF("a", "b"))
    assert(tri.count() == 10L * baseCount + distinctBaseEdges)

    // plan shape: three hash joins, never a nested-loop/cartesian —
    // the no-theta-join claim a hub must not break
    val plan = planOf(tri)
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      "triangle plan degenerated to a theta-join")
  }

  test("clustering coefficient: hub degree is exact and replicas agree") {
    val n = 120
    val base = baseEdges(n)
    val hub = 1000000L
    val edges = (replicate(base, 3, stride = 1000) ++
      (0 until n).map(i => (hub, i.toLong))).toDF("a", "b")
    val cc = Triangles.clusteringCoefficient(edges)
    val byId = cc.collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(byId(hub)._1 == n.toLong) // hub degree = n
    // replicas 1 and 2 (hub-free) must report identical per-node values
    for (i <- 0 until n)
      assert(byId(1000L + i) == byId(2000L + i), s"replica divergence at node $i")
  }

  test("pagerank: per-replica ranks identical across disjoint replicas") {
    val n = 100
    val base = baseEdges(n)
    val sym = (e: Seq[(Long, Long)]) => e ++ e.map(_.swap)
    val edges = sym(replicate(base, 4, stride = 1000)).toDF("a", "b")
    val nodes = (0 until 4).flatMap(c => (0 until n).map(i => (c * 1000 + i).toLong)).toDF("id")
    val pr = PageRank.ranks(nodes, edges, iters = 2)
    val byId = pr.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (c <- 1 until 4; i <- 0 until n)
      assert(byId(c * 1000L + i) == byId(i.toLong), s"rank divergence replica $c node $i")
  }
}
