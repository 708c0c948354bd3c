package graft

import org.apache.spark.sql.functions._

import graft.streaming.StreamingConstraints

class StreamingConstraintsSpec extends SparkSpec {
  init()

  import spark.implicits._

  test("NULL-producing predicates FAIL the check (batch Constraints semantics)") {
    // cents NULL on two rows: `cents < 100` is NULL there — it must count
    // as a failure, not blow up the Seq[Boolean] encoder
    val rows = Seq(
      (1L, 1L, Some(50L)), (2L, 2L, None), (3L, 3L, Some(40L)),
      (4L, 4L, None), (5L, 5L, Some(999L)), (6L, 6L, Some(10L))
    ).toDF("user_id", "tus", "cents")
    val got = StreamingConstraints.run(
      rows, "user_id", "tus",
      flagChecks = Seq("cents_small" -> (col("cents") < 100L)),
      minBp = Map("cents_small" -> 5000L, "cumulative_unique" -> 100L),
      chunks = 2)
    val m = got.as[(Int, String, Long, Long, Boolean)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    // batch 0: rows 1-3 (one NULL) -> 2/3 pass; batch 1: rows 4-6 (one
    // NULL, one over) -> 1/3 pass — exact basis points, NULL = fail
    assert(m((0, "cents_small")) == 2L * 10000L / 3L, m.toString)
    assert(m((1, "cents_small")) == 1L * 10000L / 3L, m.toString)
  }
}
