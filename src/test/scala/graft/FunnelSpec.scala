package graft

import graft.operators.Funnel

/** Funnel semantics on hand-computed fixtures: strict ordering, the
  * window cap anchored at step 1, earliest-completion greediness, and
  * partial completions.
  */
class FunnelSpec extends SparkSpec {
  init()
  import spark.implicits._

  private val steps = Seq("a", "b", "c")

  test("ordered completion, window cap, partials") {
    val events = Seq(
      // u1 completes in order
      (1L, 10L, "a"), (1L, 20L, "b"), (1L, 30L, "c"),
      // u2: b BEFORE a — b must not count; reaches only step a
      (2L, 20L, "a"), (2L, 10L, "b"),
      // u3: c outside the window (a at 10, window 100 → c at 200 late)
      (3L, 10L, "a"), (3L, 50L, "b"), (3L, 200L, "c"),
      // u4: never does a → absent from output
      (4L, 10L, "b"), (4L, 20L, "c"))
      .toDF("user_id", "tus", "event_type")
    val got = Funnel.analyze(events, "user_id", "tus", "event_type", steps, windowUs = 100L)
      .orderBy("user_id")
      .select("user_id", "t1", "t2", "t3", "reached")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (1L, 10L, 20L, 30L, 3L),
      (2L, 20L, -1L, -1L, 1L),
      (3L, 10L, 50L, -1L, 2L)))
  }

  test("earliest completion is greedy per step") {
    // two b's: the EARLIEST valid one (15) anchors step 2, so c at 18 counts
    val events = Seq(
      (1L, 10L, "a"), (1L, 15L, "b"), (1L, 40L, "b"), (1L, 18L, "c"))
      .toDF("user_id", "tus", "event_type")
    val got = Funnel.analyze(events, "user_id", "tus", "event_type", steps, windowUs = 100L)
      .select("t1", "t2", "t3", "reached")
      .as[(Long, Long, Long, Long)].head()
    assert(got == ((10L, 15L, 18L, 3L)))
  }

  test("same-timestamp step is not strictly after and does not advance") {
    val events = Seq((1L, 10L, "a"), (1L, 10L, "b"))
      .toDF("user_id", "tus", "event_type")
    val got = Funnel.analyze(events, "user_id", "tus", "event_type", steps, windowUs = 100L)
      .select("reached").as[Long].head()
    assert(got == 1L)
  }
}
