package graft

import graft.operators.EventPattern

class EventPatternSpec extends SparkSpec {
  init()

  import spark.implicits._

  private val syms = Map("view" -> "v", "click" -> "c", "purchase" -> "p")

  // user 1: v v c p v v p  -> 'v{2,}c?p' matches twice (vvcp, vvp)
  // user 2: v p            -> needs >= 2 views: no match
  // user 3: v v v v p      -> greedy: ONE match consuming all four views
  // user 4: errors interleaved are dropped before sequencing
  private lazy val ev = Seq(
    (1L, 1L, 11L, "view"), (1L, 2L, 12L, "view"), (1L, 3L, 13L, "click"),
    (1L, 4L, 14L, "purchase"), (1L, 5L, 15L, "view"), (1L, 6L, 16L, "view"),
    (1L, 7L, 17L, "purchase"),
    (2L, 1L, 21L, "view"), (2L, 2L, 22L, "purchase"),
    (3L, 1L, 31L, "view"), (3L, 2L, 32L, "view"), (3L, 3L, 33L, "view"),
    (3L, 4L, 34L, "view"), (3L, 5L, 35L, "purchase"),
    (4L, 1L, 41L, "view"), (4L, 2L, 42L, "error"), (4L, 3L, 43L, "view"),
    (4L, 4L, 44L, "error"), (4L, 5L, 45L, "purchase")
  ).toDF("user_id", "tus", "event_id", "event_type")

  private def run(pattern: String) = EventPattern.matchPattern(
    ev, "user_id", "tus", "event_id", "event_type", syms, pattern)

  test("quantified CEP pattern: sequences, non-overlapping matches, greedy") {
    val got = run("v{2,}c?p")
      .as[(Long, String, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got(1L) == (("vvcpvvp", 7L, 2L, "vvcp")))
    assert(got(2L) == (("vp", 2L, 0L, "")))
    assert(got(3L) == (("vvvvp", 5L, 1L, "vvvvp")))
    // dropped types never break adjacency
    assert(got(4L) == (("vvp", 3L, 1L, "vvp")))
  }

  test("alternation and anchors work; every key gets a row") {
    val alt = run("(cp|vp)$")
      .as[(Long, String, Long, Long, String)].collect()
      .map(r => r._1 -> r._4).toMap
    assert(alt.keySet == Set(1L, 2L, 3L, 4L))
    assert(alt(1L) == 1L && alt(2L) == 1L && alt(3L) == 1L && alt(4L) == 1L)
  }

  test("event_pattern TVF matches the operator") {
    ev.createOrReplaceTempView("cep_ev")
    val sqlDf = spark.sql(
      "SELECT * FROM event_pattern('cep_ev', 'user_id', 'tus', 'event_id', " +
        "'event_type', 'view:v,click:c,purchase:p', 'v{2,}c?p')")
    val scalaDf = run("v{2,}c?p")
    assert(sqlDf.columns.toSeq == scalaDf.columns.toSeq)
    assert(sqlDf.exceptAll(scalaDf).isEmpty && scalaDf.exceptAll(sqlDf).isEmpty)
  }

  test("backslash classes are interpreted ONCE: count and extract paths agree") {
    // user 1 seq "vvcpvvp": \\w{2}p matches "vcp" then "vvp" (non-overlapping)
    val got = run("\\w{2}p")
      .as[(Long, String, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._3, r._4, r._5))).toMap
    assert(got(1L) == ((7L, 2L, "vcp")))
    assert(got(2L) == ((2L, 0L, "")))
    assert(got(3L) == ((5L, 1L, "vvp")))
    assert(got(4L) == ((3L, 1L, "vvp")))
  }

  test("maxEventsPerKey guard: no-op under the bound, fails with the contract's name over it") {
    val guardedOk = EventPattern.matchPattern(
      ev, "user_id", "tus", "event_id", "event_type", syms, "v{2,}c?p",
      maxEventsPerKey = 10L)
    val base = run("v{2,}c?p")
    assert(guardedOk.exceptAll(base).isEmpty && base.exceptAll(guardedOk).isEmpty)

    // user 1 has 7 mapped events; a bound of 4 must fail BY NAME
    val ex = intercept[Exception] {
      EventPattern.matchPattern(
        ev, "user_id", "tus", "event_id", "event_type", syms, "v{2,}c?p",
        maxEventsPerKey = 4L).collect()
    }
    val msgs = Iterator.iterate(ex: Throwable)(_.getCause).takeWhile(_ != null)
      .map(_.getMessage).filter(_ != null).mkString(" | ")
    assert(msgs.contains("EventPattern.matchPattern") && msgs.contains("maxEventsPerKey=4"), msgs)
  }
}
