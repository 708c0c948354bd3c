package graft

import org.apache.spark.sql.functions._

import graft.operators.KAnonymity

class KAnonymitySpec extends SparkSpec {
  init()

  import spark.implicits._

  private def fixture = Seq(
    // (id, lang, source): en×a covers 3 rows, en×b covers 1, fr×a covers 2
    (1L, "en", "a"),
    (2L, "en", "a"),
    (3L, "en", "a"),
    (4L, "en", "b"),
    (5L, "fr", "a"),
    (6L, "fr", "a")).toDF("id", "lang", "source")

  test("census counts every combination and flags keep = n >= k") {
    val got = KAnonymity.census(fixture, Seq("lang", "source"), 2)
      .orderBy("lang", "source")
      .as[(String, String, Long, Boolean)].collect().toSeq
    assert(got == Seq(
      ("en", "a", 3L, true),
      ("en", "b", 1L, false),
      ("fr", "a", 2L, true)))
  }

  test("suppress nulls rare combos' QI values, keeps the rest, ships qi_n") {
    val got = KAnonymity.suppress(fixture, Seq("lang", "source"), 2)
      .orderBy("id")
      .as[(Long, Option[String], Option[String], Long)].collect().toSeq
    assert(got == Seq(
      (1L, Some("en"), Some("a"), 3L),
      (2L, Some("en"), Some("a"), 3L),
      (3L, Some("en"), Some("a"), 3L),
      (4L, None, None, 1L),
      (5L, Some("fr"), Some("a"), 2L),
      (6L, Some("fr"), Some("a"), 2L)))
  }

  test("NULL QI values census and suppress null-safely (no dropped rows)") {
    // two rows already carry a NULL lang: they form their own combo and
    // must still find it through the null-safe join (plain equi-join keys
    // would drop them, leaving keep/qi_n NULL)
    val df = Seq(
      (1L, Option("en"), "a"),
      (2L, Option("en"), "a"),
      (3L, Option.empty[String], "a"),
      (4L, Option.empty[String], "a")).toDF("id", "lang", "source")
    val got = KAnonymity.suppress(df, Seq("lang", "source"), 2)
      .orderBy("id")
      .as[(Long, Option[String], Option[String], Long)].collect().toSeq
    assert(got == Seq(
      (1L, Some("en"), Some("a"), 2L),
      (2L, Some("en"), Some("a"), 2L),
      (3L, None, Some("a"), 2L),
      (4L, None, Some("a"), 2L)))
  }

  test("non-QI columns pass through untouched; suppressed QI keeps its type") {
    val df = Seq((1L, "en", "a", 42.5), (2L, "fr", "b", 7.25))
      .toDF("id", "lang", "source", "score")
    val got = KAnonymity.suppress(df, Seq("lang", "source"), 2).orderBy("id")
    assert(got.columns.toSeq == Seq("id", "lang", "source", "score", "qi_n"))
    assert(got.schema("lang").dataType == org.apache.spark.sql.types.StringType)
    val rows = got.as[(Long, Option[String], Option[String], Double, Long)].collect().toSeq
    assert(rows == Seq(
      (1L, None, None, 42.5, 1L),
      (2L, None, None, 7.25, 1L)))
  }

  test("the census side is broadcast in the physical plan") {
    val plan = KAnonymity.suppress(fixture, Seq("lang", "source"), 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"),
      s"expected a broadcast census join, got:\n$plan")
  }

  // (id, zip, disease): the homogeneity attack — zip 10 clears k=3 but
  // every row shares one disease; zip 20 has 3 rows AND 3 distinct values
  private def sensFixture = Seq(
    (1L, "10", "flu"), (2L, "10", "flu"), (3L, "10", "flu"),
    (4L, "20", "flu"), (5L, "20", "cold"), (6L, "20", "none"),
    (7L, "30", "flu"), (8L, "30", "cold")).toDF("id", "zip", "disease")

  test("l-diversity: a k-passing homogeneous combo is suppressed, diverse kept") {
    val c = KAnonymity.diversityCensus(sensFixture, Seq("zip"), "disease", 3, 2)
      .orderBy("zip")
      .as[(String, Long, Long, Boolean)].collect().toSeq
    assert(c == Seq(
      ("10", 3L, 1L, false), // k passes, l fails — the homogeneity case
      ("20", 3L, 3L, true),
      ("30", 2L, 2L, false))) // l passes, k fails
    val rel = KAnonymity.suppressDiverse(sensFixture, Seq("zip"), "disease", 3, 2)
      .orderBy("id")
      .as[(Long, Option[String], String, Long, Long)].collect().toSeq
    assert(rel.map(_._2) == Seq(None, None, None,
      Some("20"), Some("20"), Some("20"), None, None))
    // the audit columns name which gate suppressed
    assert(rel.filter(_._1 <= 3).forall(r => r._4 >= 3 && r._5 < 2))
    assert(rel.filter(_._1 >= 7).forall(r => r._4 < 3 && r._5 >= 2))
  }

  test("input columns named n/keep/n_sens do not collide with census metadata") {
    // ADVICE r10: the census side once shipped bare n/keep columns into the
    // join, so a table legitimately carrying those names failed analysis
    // with an ambiguous-reference error; reserved __kanon_ names fix it
    val df = Seq(
      (1L, "en", 10L, true, 7L),
      (2L, "en", 20L, false, 8L),
      (3L, "fr", 30L, true, 9L)).toDF("id", "lang", "n", "keep", "n_sens")
    val got = KAnonymity.suppress(df, Seq("lang"), 2)
      .orderBy("id")
      .as[(Long, Option[String], Long, Boolean, Long, Long)].collect().toSeq
    assert(got == Seq(
      (1L, Some("en"), 10L, true, 7L, 2L),
      (2L, Some("en"), 20L, false, 8L, 2L),
      (3L, None, 30L, true, 9L, 1L)))
    // the diverse path's n_sens metadata column likewise
    val div = KAnonymity.suppressDiverse(df, Seq("lang"), "id", 2, 2)
      .orderBy("id")
      .select("lang", "qi_n", "qi_nsens")
      .as[(Option[String], Long, Long)].collect().toSeq
    assert(div == Seq(
      (Some("en"), 2L, 2L), (Some("en"), 2L, 2L), (None, 1L, 1L)))
  }

  test("l-diversity reduces to k-anonymity at l = 1") {
    val a = KAnonymity.suppress(fixture, Seq("lang", "source"), 2)
      .select("id", "lang", "source", "qi_n").orderBy("id").collect().toSeq
    val b = KAnonymity.suppressDiverse(
        fixture.withColumn("sens", lit("x")), Seq("lang", "source"), "sens", 2, 1)
      .select("id", "lang", "source", "qi_n").orderBy("id").collect().toSeq
    assert(a == b)
  }
}
