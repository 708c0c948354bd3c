package graft

import org.apache.spark.sql.functions._

import graft.operators.Profiling

class ProfilingSpec extends SparkSpec {
  init()

  import spark.implicits._

  test("FD audit: holds/violations hand-computed on a fixture") {
    // k is a key (k → x and k → y hold); x → y fails with exactly one
    // extra combo (x=1 maps to y 'p' and 'q'); y → x fails with two
    val df = Seq(
      (1L, 1L, "p"),
      (2L, 1L, "q"),
      (3L, 2L, "p"),
      (4L, 2L, "p")).toDF("k", "x", "y")
    val got = Profiling.functionalDependencies(df, Seq("k", "x", "y"))
      .orderBy("a", "b")
      .as[(String, String, Long, Long, Boolean, Long)].collect().toSeq
    assert(got == Seq(
      ("k", "x", 4L, 4L, true, 0L),
      ("k", "y", 4L, 4L, true, 0L),
      ("x", "k", 2L, 4L, false, 2L),
      ("x", "y", 2L, 3L, false, 1L),
      ("y", "k", 2L, 4L, false, 2L),
      ("y", "x", 2L, 3L, false, 1L)))
  }

  test("FD audit: NULL rows are excluded from affected pairs only") {
    val df = Seq(
      (Some(1L), Some("a"), Some("u")),
      (Some(2L), None, Some("v")),
      (Some(3L), Some("b"), None)).toDF("k", "x", "y")
    val got = Profiling.functionalDependencies(df, Seq("k", "x", "y"))
      .orderBy("a", "b")
      .as[(String, String, Long, Long, Boolean, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    assert(got(("k", "x")) == ((2L, 2L))) // the x-null row drops
    assert(got(("k", "y")) == ((2L, 2L))) // the y-null row drops
    assert(got(("x", "y")) == ((1L, 1L))) // only row 1 has both
  }

  test("IND audit: subset directions, dangling counts, null exclusion") {
    val child = Seq(Some(1L), Some(2L), Some(2L), Some(3L), None).toDF("fk")
    val parent = Seq(1L, 2L, 3L, 4L, 5L).toDF("pk")
    val got = Profiling.inclusionDependencies(Seq(
        ("child.fk", child, "fk"),
        ("parent.pk", parent, "pk")))
      .orderBy("a", "b")
      .as[(String, String, Long, Long, Boolean)].collect().toSeq
    assert(got == Seq(
      ("child.fk", "parent.pk", 3L, 0L, true), // NULL fk excluded, all 3 found
      ("parent.pk", "child.fk", 5L, 2L, false))) // 4 and 5 dangle
  }

  test("IND audit: every source scanned once (no per-pair EXCEPT joins)") {
    val li = graft.core.Tables(spark, sfSmoke, "lineitem")
    val o = graft.core.Tables(spark, sfSmoke, "orders")
    val plan = Profiling.inclusionDependencies(Seq(
        ("li", li, "l_orderkey"), ("o", o, "o_orderkey"), ("oc", o, "o_custkey")))
      .queryExecution.executedPlan.toString
    val scans = plan.split("\n").count(_.contains("Scan parquet"))
    assert(scans == 3, s"expected 3 scans (one per source), got $scans:\n$plan")
  }

  test("FD audit plan: one table scan, no per-pair rescans") {
    val orders = graft.core.Tables(spark, sfSmoke, "orders")
    val plan = Profiling
      .functionalDependencies(orders, Seq("o_orderkey", "o_custkey", "o_orderstatus"))
      .queryExecution.executedPlan.toString
    val scans = plan.split("\n").count(_.contains("Scan parquet"))
    assert(scans == 1, s"expected one scan, got $scans:\n$plan")
  }
}
