package graft

import org.apache.spark.sql.functions._

import graft.operators.LabelPropagation

class LabelPropagationSpec extends SparkSpec {
  init()

  import spark.implicits._

  private def undirected(pairs: Seq[(Long, Long)]) =
    (pairs ++ pairs.map(p => (p._2, p._1))).toDF("a", "b")

  /** Reference implementation: synchronous plurality rounds with the
    * (count desc, label asc) tie-break, isolated nodes keep their label.
    */
  private def brute(
      nodes: Seq[Long], edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val adjIn = (edges ++ edges.map(e => (e._2, e._1)))
      .groupBy(_._2).view.mapValues(_.map(_._1)).toMap
    var l = nodes.map(n => n -> n).toMap
    (1 to iters).foreach { _ =>
      l = nodes.map { v =>
        val nbrs = adjIn.getOrElse(v, Seq.empty).map(l)
        if (nbrs.isEmpty) v -> l(v)
        else v -> nbrs.groupBy(identity).view.mapValues(_.size).toSeq
          .minBy { case (lab, c) => (-c, lab) }._1
      }.toMap
    }
    l
  }

  test("two cliques + a bridge: one CC, two communities") {
    // cliques {1,2,3,4} and {10,11,12,13}, bridged 4–10: connected
    // components would merge everything; plurality voting keeps two sides
    val cl = for {
      s <- Seq(Seq(1L, 2L, 3L, 4L), Seq(10L, 11L, 12L, 13L))
      (x, i) <- s.zipWithIndex; y <- s.drop(i + 1)
    } yield (x, y)
    val edges = cl :+ (4L, 10L)
    val nodes = (Seq(1L, 2L, 3L, 4L) ++ Seq(10L, 11L, 12L, 13L)).toDF("id")
    val got = LabelPropagation
      .propagate(nodes, undirected(edges), iters = 3)
      .as[(Long, Long)].collect().toMap
    assert(got == brute(Seq(1L, 2L, 3L, 4L, 10L, 11L, 12L, 13L), edges, 3), got.toString)
    val sides = got.groupBy(_._2).values.map(_.keySet).toSet
    assert(sides == Set(Set(1L, 2L, 3L, 4L), Set(10L, 11L, 12L, 13L)), got.toString)
  }

  test("matches brute force on a random graph; isolated nodes keep their id") {
    val rnd = new scala.util.Random(7)
    val nodes = (0L until 60L)
    val edges = Seq.fill(120)((rnd.nextInt(50).toLong, rnd.nextInt(50).toLong))
      .filter(e => e._1 != e._2).distinct // nodes 50..59 stay isolated
    for (iters <- Seq(1, 2, 4)) {
      val got = LabelPropagation
        .propagate(nodes.toDF("id"), undirected(edges), iters)
        .as[(Long, Long)].collect().toMap
      assert(got == brute(nodes, edges, iters), s"iters=$iters")
      (50L until 60L).foreach(v => assert(got(v) == v))
    }
  }

  test("deterministic across runs and partitionings") {
    val rnd = new scala.util.Random(13)
    val edges = Seq.fill(200)((rnd.nextInt(80).toLong, rnd.nextInt(80).toLong))
      .filter(e => e._1 != e._2).distinct
    val nodes = (0L until 80L).toDF("id")
    val a = LabelPropagation.propagate(nodes.repartition(1), undirected(edges), 3)
      .as[(Long, Long)].collect().toMap
    val b = LabelPropagation.propagate(nodes.repartition(7), undirected(edges).repartition(5), 3)
      .as[(Long, Long)].collect().toMap
    assert(a == b)
  }

  test("communities roll-up sums to the node count") {
    val edges = Seq((1L, 2L), (2L, 3L), (4L, 5L))
    val nodes = (1L to 6L).toDF("id")
    val labels = LabelPropagation.propagate(nodes, undirected(edges), 2)
    val sizes = LabelPropagation.communities(labels)
      .as[(Long, Long)].collect().toMap
    assert(sizes.values.sum == 6L)
  }
}
