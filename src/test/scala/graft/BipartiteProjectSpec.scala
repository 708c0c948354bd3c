package graft

import graft.operators.BipartiteProject

class BipartiteProjectSpec extends SparkSpec {
  init()
  import spark.implicits._

  private def brute(inter: Seq[(Long, Long)], minShared: Long, cap: Int)
      : Map[(Long, Long), Long] = {
    val e = inter.distinct
    val byUser = e.groupBy(_._1).view.mapValues(_.map(_._2).distinct).toMap
      .filter(_._2.size <= cap)
    byUser.values.toSeq
      .flatMap(items => for (i <- items; j <- items if i < j) yield (i, j))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
      .filter(_._2 >= minShared).toMap
  }

  private def run(inter: Seq[(Long, Long)], minShared: Long, cap: Int)
      : Map[(Long, Long), Long] =
    BipartiteProject.project(inter.toDF("u", "i"), "u", "i", minShared, cap)
      .as[(Long, Long, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap

  test("co-occurrence counts match brute force; duplicates collapse") {
    val inter = Seq[(Long, Long)](
      (1, 10), (1, 11), (1, 12),
      (2, 10), (2, 11),
      (3, 10), (3, 11),
      (3, 10)) // duplicate interaction
    val got = run(inter, minShared = 1L, cap = 100)
    assert(got == brute(inter, 1L, 100))
    assert(got((10L, 11L)) == 3L)
    assert(got((10L, 12L)) == 1L)
    assert(run(inter, 2L, 100) == brute(inter, 2L, 100))
    assert(!run(inter, 2L, 100).contains((10L, 12L)))
  }

  test("power users above the degree cap form no pairs") {
    val inter = (10L to 30L).map(i => (99L, i)) ++ // degree-21 power user
      Seq[(Long, Long)]((1, 10), (1, 11))
    val got = run(inter, 1L, cap = 20)
    assert(got == Map((10L, 11L) -> 1L))
    assert(run(inter, 1L, cap = 25) == brute(inter, 1L, 25)) // cap raised: included
  }

  test("deterministic under repartition") {
    val inter = (0 until 400).map(i => ((i % 19).toLong, ((i * 7) % 23).toLong))
    val df = inter.toDF("u", "i")
    val a = BipartiteProject.project(df, "u", "i", 2L, 100).orderBy("i", "j")
      .collect().toSeq
    val b = BipartiteProject.project(df.repartition(13), "u", "i", 2L, 100)
      .orderBy("i", "j").collect().toSeq
    assert(a == b)
  }
}
