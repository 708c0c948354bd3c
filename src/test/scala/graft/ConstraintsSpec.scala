package graft

import org.apache.spark.sql.functions._

import graft.operators.Constraints
import graft.operators.Constraints._

class ConstraintsSpec extends SparkSpec {
  init()

  import spark.implicits._

  // 10 rows: 1 null custkey, 2 dup orderkeys, 1 bad status, 1 bad
  // priority, 1 FK violation (cust 99)
  private lazy val orders = Seq(
    (1L, Option(10L), "F", "1-URGENT"),
    (2L, Option(11L), "O", "2-HIGH"),
    (2L, Option(12L), "P", "3-MEDIUM"),
    (4L, None, "F", "4-LOW"),
    (5L, Option(10L), "X", "5-LOW"),
    (6L, Option(11L), "O", "9-BAD"),
    (7L, Option(12L), "F", "1-URGENT"),
    (8L, Option(10L), "O", "2-HIGH"),
    (9L, Option(99L), "P", "3-MEDIUM"),
    (10L, Option(11L), "F", "4-LOW")
  ).toDF("ok", "ck", "st", "pr")

  private lazy val customers = Seq(10L, 11L, 12L).toDF("cid")

  test("every check kind computes its exact metric and verdict") {
    val got = Constraints.validate(orders, Seq(
        Complete("ck", 9500L),
        InRange("ck", 10L, 12L, 9000L),
        InSet("st", Seq("F", "O", "P"), 10000L),
        MatchesRegex("pr", "^[1-5]-", 9000L),
        RowCount(10L, 10L),
        Unique("ok"),
        ForeignKey("ck", customers, "cid")))
      .as[(String, String, Long, Long, Boolean)].collect().toSet
    assert(got == Set(
      ("complete", "ck", 9000L, 9500L, false),            // 9/10
      ("in_range", "ck[10,12]", 8000L, 9000L, false),     // 8/10 (null + 99)
      ("in_set", "st{F|O|P}", 9000L, 10000L, false),      // 9/10
      ("regex", "pr~^[1-5]-", 9000L, 9000L, true),        // 9/10
      ("row_count", "[10,10]", 10L, 10L, true),
      ("unique", "ok", 9000L, 10000L, false),             // 9 distinct / 10
      ("foreign_key", "ck->cid", 1L, 0L, false)))         // cust 99
  }

  test("uniqueness counts NULL as a value") {
    val m = Constraints.validate(orders, Seq(Unique("ck", 1L)))
      .select("metric_bp").as[Long].head()
    // distinct non-null {10,11,12,99} + the null group = 5 of 10
    assert(m == 5000L)
  }

  test("the scan tier is ONE aggregation over ONE scan regardless of check count") {
    val suite = Constraints.validate(orders, Seq(
      Complete("ck", 1L), InRange("ck", 1L, 99L, 1L), InSet("st", Seq("F"), 1L),
      MatchesRegex("pr", "^[1-5]-", 1L), RowCount(1L, 100L)))
    val plan = suite.queryExecution.optimizedPlan.toString
    val nAggs = "Aggregate".r.findAllIn(plan).length
    val nScans = "LocalRelation".r.findAllIn(plan).length +
      "Scan".r.findAllIn(plan).length
    assert(nAggs == 1, s"expected 1 Aggregate for 5 scan checks:\n$plan")
    assert(nScans <= 2, s"expected one data scan (+ spec relation):\n$plan")
  }

  test("empty input: ratios report 0 and fail (no divide-by-zero); row_count still bounds") {
    val empty = orders.limit(0)
    val got = Constraints.validate(empty, Seq(
        Complete("ck", 9500L),
        Unique("ok"),
        RowCount(1L, 100L),
        RowCount(0L, 100L)))
      .as[(String, String, Long, Long, Boolean)].collect().toSet
    assert(got == Set(
      ("complete", "ck", 0L, 9500L, false),   // the 0-row batch ALARMS
      ("unique", "ok", 0L, 10000L, false),
      ("row_count", "[1,100]", 0L, 1L, false),
      ("row_count", "[0,100]", 0L, 0L, true))) // zero rows allowed explicitly
  }

  test("constraint_checks TVF parses the DSL and matches the operator") {
    orders.createOrReplaceTempView("cq_orders")
    customers.createOrReplaceTempView("cq_customers")
    val sqlDf = spark.sql(
      "SELECT * FROM constraint_checks('cq_orders', " +
        "'complete:ck:9500;in_range:ck:10:12:9000;in_set:st:F|O|P:10000;" +
        "regex:pr:^[1-5]-:9000;row_count:10:10;unique:ok:10000;" +
        "fk:ck:cq_customers:cid')")
    val scalaDf = Constraints.validate(orders, Seq(
      Complete("ck", 9500L),
      InRange("ck", 10L, 12L, 9000L),
      InSet("st", Seq("F", "O", "P"), 10000L),
      MatchesRegex("pr", "^[1-5]-", 9000L),
      RowCount(10L, 10L),
      Unique("ok"),
      ForeignKey("ck", customers, "cid")))
    assert(sqlDf.columns.toSeq == scalaDf.columns.toSeq)
    // targets differ only on the fk ref name — compare by (check, metric, pass)
    def key(df: org.apache.spark.sql.DataFrame) =
      df.select("check", "metric_bp", "threshold_bp", "pass")
        .as[(String, Long, Long, Boolean)].collect().toSet
    assert(key(sqlDf) == key(scalaDf))
  }
}
