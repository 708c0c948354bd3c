package graft

import graft.operators.NegativeSampling

class NegativeSamplingSpec extends SparkSpec {
  init()
  import spark.implicits._

  // 10 users, 50 items; user u interacted with items u+1 .. u+5
  private val inter: Seq[(Long, Long)] =
    (0L until 10L).flatMap(u => (1L to 5L).map(i => (u, u + i)))

  test("negatives never collide with interactions, respect k, and are deterministic") {
    val got = NegativeSampling.sample(inter.toDF("u", "i"), "u", "i",
        numItems = 50L, k = 5, oversample = 4)
      .as[(Long, Long, Long)].collect().toSeq
    val interSet = inter.toSet
    assert(got.forall { case (u, i, _) => !interSet.contains((u, i)) })
    assert(got.forall { case (_, i, _) => i >= 1L && i <= 50L })
    val perUser = got.groupBy(_._1)
    assert(perUser.keySet == (0L until 10L).toSet)
    assert(perUser.values.forall(_.size == 5))
    // per-user items are distinct
    assert(perUser.values.forall(g => g.map(_._2).distinct.size == g.size))
    val again = NegativeSampling.sample(inter.toDF("u", "i").repartition(7), "u", "i",
        50L, 5, 4).as[(Long, Long, Long)].collect().toSeq
    assert(got.sorted == again.sorted)
  }

  test("draws replay the md5 formula and winners are the k lowest surviving draws") {
    val got = NegativeSampling.sample(inter.toDF("u", "i"), "u", "i", 50L, 3, 4)
      .as[(Long, Long, Long)].collect().toSeq
    val md = java.security.MessageDigest.getInstance("MD5")
    def draw(u: Long, j: Long): Long = {
      val h = md.digest(s"$u:$j".getBytes("UTF-8"))
        .take(4).foldLeft(0L)((a, b) => (a << 8) | (b & 0xffL))
      h % 50 + 1
    }
    val interSet = inter.toSet
    (0L until 10L).foreach { u =>
      val surviving = (0L until 12L).map(j => (j, draw(u, j)))
        .filterNot { case (_, i) => interSet.contains((u, i)) }
        .groupBy(_._2).map { case (i, ds) => (ds.map(_._1).min, i) }
        .toSeq.sorted.take(3)
      val mine = got.filter(_._1 == u).map(t => (t._3, t._2)).sorted
      assert(mine == surviving, s"user $u")
    }
  }

  test("a user saturating the item space yields fewer than k, never a fake negative") {
    val dense = (1L to 49L).map(i => (7L, i)) // user 7 holds all but item 50
    val got = NegativeSampling.sample(dense.toDF("u", "i"), "u", "i", 50L, 5, 4)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got.forall(_._2 == 50L))
    assert(got.size <= 1)
  }
}
