package graft

import graft.operators.IntervalJoin

/** Bucketed overlap join vs the brute-force inequality join on fixtures
  * exercising every boundary: touching endpoints, containment, multi-
  * bucket spans, same-bucket non-overlaps, and key isolation.
  */
class IntervalJoinSpec extends SparkSpec {
  init()
  import spark.implicits._

  private def brute(
      l: Seq[(Long, Long, Long, String)],
      r: Seq[(Long, Long, Long, String)]): Set[(String, String)] =
    (for {
      (lk, ls, le, ln) <- l
      (rk, rs, re, rn) <- r
      if lk == rk && ls <= re && rs <= le
    } yield (ln, rn)).toSet

  test("equals brute force across boundary shapes and widths") {
    val l = Seq(
      (1L, 0L, 10L, "a"), // touches b1 at 10
      (1L, 20L, 120L, "b"), // spans many buckets
      (1L, 200L, 201L, "c"), // same bucket as d but disjoint
      (2L, 0L, 1000L, "d")) // other key
    val r = Seq(
      (1L, 10L, 15L, "r1"), // endpoint touch with a
      (1L, 115L, 130L, "r2"), // tail overlap with b
      (1L, 203L, 205L, "r3"), // near c, no overlap
      (2L, 500L, 501L, "r4")) // inside d, other key
    val want = brute(l, r)
    assert(want == Set(("a", "r1"), ("b", "r2"), ("d", "r4")))
    for (width <- Seq(1L, 7L, 64L, 1000L)) {
      val got = IntervalJoin
        .overlap(
          l.toDF("k", "ls", "le", "ln"),
          r.toDF("k", "rs", "re", "rn"),
          Seq("k"), "ls", "le", "rs", "re", width)
        .select("ln", "rn").as[(String, String)].collect().toSet
      assert(got == want, s"width=$width: got $got want $want")
    }
  }

  test("duplicate input rows keep their multiplicity") {
    // two IDENTICAL left rows must produce two pairs, exactly as the
    // brute-force inequality join counts them — a full-row distinct()
    // would silently collapse them (ADVICE r8, medium)
    val l = Seq((1L, 0L, 600L, "e"), (1L, 0L, 600L, "e"), (1L, 50L, 70L, "f"))
      .toDF("k", "ls", "le", "ln")
    val r = Seq((1L, 300L, 900L, "w"), (1L, 300L, 900L, "w"))
      .toDF("k", "rs", "re", "rn")
    // brute multiset: e×w ×(2·2)=4 pairs; f doesn't overlap w
    val got = IntervalJoin
      .overlap(l, r, Seq("k"), "ls", "le", "rs", "re", 100L)
      .select("ln", "rn").as[(String, String)].collect().toSeq.sorted
    assert(got == Seq.fill(4)(("e", "w")), s"multiplicity lost: $got")
  }

  test("multi-bucket overlap emits exactly one pair") {
    val l = Seq((1L, 0L, 100L, "x")).toDF("k", "ls", "le", "ln")
    val r = Seq((1L, 0L, 100L, "y")).toDF("k", "rs", "re", "rn")
    val got = IntervalJoin.overlap(l, r, Seq("k"), "ls", "le", "rs", "re", 10L).collect()
    assert(got.length == 1, s"shared-bucket duplicates leaked: ${got.length}")
  }
}
