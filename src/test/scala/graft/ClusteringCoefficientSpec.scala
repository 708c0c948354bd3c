package graft

import graft.operators.Triangles

/** Clustering-coefficient values on hand-computed graphs: clique = 10000
  * bp, star hub = 0, partial neighborhoods in between, degree<2 floor.
  */
class ClusteringCoefficientSpec extends SparkSpec {
  init()
  import spark.implicits._

  test("clique, star, and partial neighborhoods") {
    val edges = Seq[(Long, Long)](
      // triangle {1,2,3}: every node cc = 10000
      (1, 2), (2, 3), (1, 3),
      // star hub 10 → {11,12,13} with one closing edge (11,12):
      // hub: d=3, T=1 → 2*1/(3*2) = 3333 bp; 11: d=2, T=1 → 10000
      (10, 11), (10, 12), (10, 13), (11, 12),
      // pendant 20-21: degree 1 → 0
      (20, 21))
      .toDF("a", "b")
    val got = Triangles.clusteringCoefficient(edges)
      .orderBy("id")
      .as[(Long, Long, Long, Long)].collect().toSeq
    val byId = got.map(r => r._1 -> r).toMap
    assert(byId(1L) == ((1L, 2L, 1L, 10000L)))
    assert(byId(10L) == ((10L, 3L, 1L, 3333L)))
    assert(byId(11L) == ((11L, 2L, 1L, 10000L)))
    assert(byId(13L) == ((13L, 1L, 0L, 0L)))
    assert(byId(20L) == ((20L, 1L, 0L, 0L)))
  }
}
