package graft

import graft.operators.Transitions

class TransitionsSpec extends SparkSpec {
  init()
  import spark.implicits._

  // user 1: a→b→a→c ; user 2: b→a ; transitions: a→b, b→a(×2), a→c
  private def ev = Seq(
    (1L, 10L, 0L, "a"), (1L, 20L, 1L, "b"), (1L, 30L, 2L, "a"), (1L, 40L, 3L, "c"),
    (2L, 5L, 4L, "b"), (2L, 6L, 5L, "a")).toDF("uid", "t", "id", "st")

  test("keyed successor pairs, exact conditional basis points") {
    val got = Transitions.matrix(ev, "uid", "t", "id", "st")
      .orderBy("state", "next").as[(String, String, Long, Long)].collect().toSeq
    assert(got == Seq(
      ("a", "b", 1L, 5000L), ("a", "c", 1L, 5000L), ("b", "a", 2L, 10000L)))
  }

  test("sequence boundaries do not leak across keys") {
    // without the key partition, user1's trailing 'c' would chain into
    // user2's leading 'b'
    val got = Transitions.matrix(ev, "uid", "t", "id", "st")
      .filter($"state" === "c").count()
    assert(got == 0L)
  }

  test("ties order by the tiebreak column deterministically") {
    val tied = Seq(
      (1L, 10L, 1L, "x"), (1L, 10L, 0L, "y"), (1L, 10L, 2L, "z")).toDF("uid", "t", "id", "st")
    val got = Transitions.matrix(tied, "uid", "t", "id", "st")
      .orderBy("state").as[(String, String, Long, Long)].collect().toSeq
    assert(got == Seq(("x", "z", 1L, 10000L), ("y", "x", 1L, 10000L)))
  }

  test("hot-key guard fails with the contract's name") {
    val big = (0 until 20).map(i => (1L, i.toLong, i.toLong, "s")).toDF("uid", "t", "id", "st")
    val e = intercept[Exception] {
      Transitions.matrix(big, "uid", "t", "id", "st", maxEventsPerKey = 10L).collect()
    }
    assert(e.getMessage.contains("Transitions.matrix"))
  }

  test("markov_transitions TVF round-trips the Scala path") {
    ev.createOrReplaceTempView("tr_ev")
    val tvf = spark.sql(
      "SELECT * FROM markov_transitions('tr_ev', 'uid', 't', 'id', 'st')")
      .orderBy("state", "next").collect().toSeq
    val direct = Transitions.matrix(ev, "uid", "t", "id", "st")
      .orderBy("state", "next").collect().toSeq
    assert(tvf == direct)
  }
}
