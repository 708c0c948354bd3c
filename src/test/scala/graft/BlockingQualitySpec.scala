package graft

import graft.operators.BlockingQuality

class BlockingQualitySpec extends SparkSpec {
  init()
  import spark.implicits._

  test("hand-computed report: histogram pair arithmetic, no pair materialization") {
    // 6 ids; blocks: {1,2,3} {4,5} {6}; truth clusters: {1,2} {3,4} {5} {6}
    val blocks = Seq((1L, "x"), (2L, "x"), (3L, "x"), (4L, "y"), (5L, "y"), (6L, "z"))
    val truth = Seq((1L, "a"), (2L, "a"), (3L, "b"), (4L, "b"), (5L, "c"), (6L, "d"))
    val got = BlockingQuality.report(
        blocks.toDF("id", "blk"), truth.toDF("id", "cl"), "id", "blk", "cl")
      .as[(Long, Long, Long, Long, Long, Long)].head()
    // cand = C(3,2)+C(2,2) = 3+1 = 4; truth = 1+1 = 2
    // co-blocked truth: (1,2) share x -> yes; (3,4) split x/y -> no => 1
    // completeness = 5000 bp; reduction = 10000 - 10000*4/15 = 7334
    assert(got == ((6L, 2L, 4L, 1L, 5000L, 10000L - 10000L * 4 / 15)))
  }

  test("blocking on a function of the cluster key keeps completeness at exactly 10000") {
    // same text -> same prefix: every exact-dup pair stays co-blocked
    val ids = (0 until 90).map(i => (i.toLong, s"text-${i % 30}-padding"))
    val blocks = ids.map { case (id, t) => (id, t.take(7)) }
    val truth = ids.map { case (id, t) => (id, t) }
    val got = BlockingQuality.report(
        blocks.toDF("id", "blk"), truth.toDF("id", "cl"), "id", "blk", "cl")
      .as[(Long, Long, Long, Long, Long, Long)].head()
    assert(got._5 == 10000L)
    assert(got._2 == 90L) // 30 clusters of 3 -> 30 * C(3,2)
  }

  test("empty truth (all singletons) reports completeness 10000 by convention") {
    val blocks = Seq((1L, "x"), (2L, "x"))
    val truth = Seq((1L, "a"), (2L, "b"))
    val got = BlockingQuality.report(
        blocks.toDF("id", "blk"), truth.toDF("id", "cl"), "id", "blk", "cl")
      .as[(Long, Long, Long, Long, Long, Long)].head()
    assert(got._2 == 0L && got._5 == 10000L)
  }

  test("multi-blocked ids fail by name") {
    val blocks = Seq((1L, "x"), (1L, "y"), (2L, "x"))
    val truth = Seq((1L, "a"), (2L, "a"))
    val ex = intercept[Exception] {
      BlockingQuality.report(
        blocks.toDF("id", "blk"), truth.toDF("id", "cl"), "id", "blk", "cl").collect()
    }
    assert(ex.getMessage.contains("one block per id")
      || ex.getCause != null && ex.getCause.getMessage.contains("one block per id"))
  }
}
