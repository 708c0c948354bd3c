package graft

import graft.operators.Triangles

/** Degree-oriented triangle enumeration vs brute force on shapes that
  * stress the orientation: hubs, cliques, shared edges, duplicates.
  */
class TrianglesSpec extends SparkSpec {
  init()
  import spark.implicits._

  private def brute(edges: Seq[(Long, Long)]): Set[(Long, Long, Long)] = {
    val e = edges.map { case (a, b) => (math.min(a, b), math.max(a, b)) }.toSet
    val vs = e.flatMap(p => Seq(p._1, p._2)).toSeq.sorted
    (for {
      x <- vs; y <- vs if x < y && e((x, y))
      z <- vs if y < z && e((y, z)) && e((x, z))
    } yield (x, y, z)).toSet
  }

  test("equals brute force on a hub + clique + chain graph") {
    val edges = Seq[(Long, Long)](
      // 4-clique {1,2,3,4} → 4 triangles
      (1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),
      // hub 10 connected to 11..15, with one closing edge (11,12)
      (10, 11), (10, 12), (10, 13), (10, 14), (10, 15), (11, 12),
      // chain, no triangles
      (20, 21), (21, 22), (22, 23),
      // duplicate + reversed edges must not double-count
      (2, 1), (3, 4))
    val want = brute(edges)
    assert(want.size == 5, s"fixture sanity: $want")
    val got = Triangles.enumerate(edges.toDF("a", "b"))
      .as[(Long, Long, Long)].collect().toSet
    assert(got == want)
    // exactly once each
    val rows = Triangles.enumerate(edges.toDF("a", "b")).count()
    assert(rows == want.size.toLong)
  }

  test("edge support counts triangles per edge; bridges report 0") {
    val edges = Seq[(Long, Long)](
      (1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), // 4-clique
      (4, 5), // bridge
      (10, 11), (10, 12), (11, 12)) // lone triangle
    val got = Triangles.edgeSupport(edges.toDF("a", "b"))
      .as[(Long, Long, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
    // every clique edge sits in exactly 2 of the 4 triangles
    Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L)).foreach { e =>
      assert(got(e) == 2L, e)
    }
    assert(got((4L, 5L)) == 0L)
    Seq((10L, 11L), (10L, 12L), (11L, 12L)).foreach(e => assert(got(e) == 1L, e))
    // consistency law: sum of supports = 3 * triangle count
    assert(got.values.sum ==
      3L * Triangles.enumerate(edges.toDF("a", "b")).count())
  }
}
