package graft

import graft.operators.Intervals

class IntervalsSpec extends SparkSpec {
  init()
  import spark.implicits._

  test("overlaps merge, gaps split, covered is the union measure") {
    val iv = Seq(
      // key a: [0,10] ∪ [5,12] ∪ [12,15] chain to one island [0,15];
      // [20,25] opens a second — covered 15+5, max gap 5
      ("a", 0L, 10L), ("a", 5L, 12L), ("a", 12L, 15L), ("a", 20L, 25L),
      // key b: three disjoint unit intervals, gaps 9 and 89
      ("b", 0L, 1L), ("b", 10L, 11L), ("b", 100L, 101L),
      // key c: nested interval is absorbed
      ("c", 0L, 100L), ("c", 10L, 20L)).toDF("k", "s", "e")
    val got = Intervals.unionLength(iv, "k", "s", "e")
      .orderBy("k").as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      ("a", 4L, 2L, 20L, 5L),
      ("b", 3L, 3L, 3L, 89L),
      ("c", 2L, 1L, 100L, 0L)))
  }

  test("duplicate intervals and touching endpoints chain") {
    val iv = Seq(("k", 0L, 5L), ("k", 0L, 5L), ("k", 5L, 9L)).toDF("k", "s", "e")
    val got = Intervals.unionLength(iv, "k", "s", "e")
      .as[(String, Long, Long, Long, Long)].head()
    assert(got == (("k", 3L, 1L, 9L, 0L)))
  }

  test("empty intervals fail by name") {
    val iv = Seq(("k", 5L, 5L)).toDF("k", "s", "e")
    val e = intercept[Exception] { Intervals.unionLength(iv, "k", "s", "e").collect() }
    assert(e.getMessage.contains("Intervals.unionLength"))
  }

  test("hot-key guard fails with the contract's name") {
    val iv = (0 until 30).map(i => ("k", i.toLong * 2, i.toLong * 2 + 1)).toDF("k", "s", "e")
    val e = intercept[Exception] {
      Intervals.unionLength(iv, "k", "s", "e", maxIntervalsPerKey = 10L).collect()
    }
    assert(e.getMessage.contains("Intervals.unionLength"))
  }

  test("interval_union TVF round-trips the Scala path") {
    val iv = Seq(("k", 0L, 5L), ("k", 3L, 9L)).toDF("k", "s", "e")
    iv.createOrReplaceTempView("iv_rows")
    val tvf = spark.sql("SELECT * FROM interval_union('iv_rows', 'k', 's', 'e')")
      .collect().toSeq
    val direct = Intervals.unionLength(iv, "k", "s", "e").collect().toSeq
    assert(tvf == direct)
  }
}
