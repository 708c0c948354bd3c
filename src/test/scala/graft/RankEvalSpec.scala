package graft

import graft.operators.RankEval

class RankEvalSpec extends SparkSpec {
  init()
  import spark.implicits._

  // run: q1 ranks [d1, d2, d3]; q2 ranks [d9, d4]; q3 answered nothing
  private def run = Seq(
    ("q1", "d1", 1L), ("q1", "d2", 2L), ("q1", "d3", 3L),
    ("q2", "d9", 1L), ("q2", "d4", 2L)).toDF("q", "d", "rank")

  // qrels: q1 → {d2, d7}; q2 → {d4}; q3 → {d5}
  private def qrels = Seq(
    ("q1", "d2"), ("q1", "d7"), ("q2", "d4"), ("q3", "d5")).toDF("q", "d")

  test("per-query metrics: hit ranks, misses, and unanswered queries") {
    val got = RankEval.perQuery(run, qrels, "q", "d", "rank", k = 3)
      .orderBy("q")
      .as[(String, Long, Long, Option[Long], Long, Long, Long, Boolean)]
      .collect().toSeq
    assert(got == Seq(
      // q1: 1 of 2 relevant found, first at rank 2 → rr 500000, r 5000, p 3333
      ("q1", 2L, 1L, Some(2L), 500000L, 5000L, 3333L, true),
      // q2: the single relevant found at rank 2
      ("q2", 1L, 1L, Some(2L), 500000L, 10000L, 3333L, true),
      // q3: unanswered — still a row, all zeros (trec_eval convention)
      ("q3", 1L, 0L, None, 0L, 0L, 0L, false)))
  }

  test("cutoff excludes hits past k") {
    val got = RankEval.perQuery(run, qrels, "q", "d", "rank", k = 1)
      .orderBy("q").as[(String, Long, Long, Option[Long], Long, Long, Long, Boolean)]
      .collect().toSeq
    // every relevant doc sits at rank 2 — at k=1 all three queries miss
    assert(got.forall(r => r._3 == 0L && !r._8))
  }

  test("summary is the floor-divided mean of the per-query rows") {
    val got = RankEval.summary(run, qrels, "q", "d", "rank", k = 3)
      .as[(Long, Long, Long, Long, Long)].head()
    // (500000+500000+0)/3, (5000+10000+0)/3, (3333·2)/3, 2 hits of 3
    assert(got == ((3L, 333333L, 5000L, 2222L, 6666L)))
  }

  test("a doc listed twice in the run counts once, at its best rank") {
    val dup = run.union(Seq(("q1", "d2", 3L)).toDF("q", "d", "rank"))
    val a = RankEval.perQuery(run, qrels, "q", "d", "rank", 3).orderBy("q").collect().toSeq
    val b = RankEval.perQuery(dup, qrels, "q", "d", "rank", 3).orderBy("q").collect().toSeq
    assert(a == b)
  }

  test("duplicate qrels pairs do not double-count") {
    val dup = qrels.union(qrels)
    val a = RankEval.perQuery(run, qrels, "q", "d", "rank", 3).orderBy("q").collect().toSeq
    val b = RankEval.perQuery(run, dup, "q", "d", "rank", 3).orderBy("q").collect().toSeq
    assert(a == b)
  }

  test("rank_eval TVF round-trips the Scala path") {
    run.createOrReplaceTempView("re_run")
    qrels.createOrReplaceTempView("re_qrels")
    val tvf = spark.sql(
      "SELECT * FROM rank_eval('re_run', 're_qrels', 'q', 'd', 'rank', 3)")
      .orderBy("q").collect().toSeq
    val direct = RankEval.perQuery(run, qrels, "q", "d", "rank", 3)
      .orderBy("q").collect().toSeq
    assert(tvf == direct)
  }
}
