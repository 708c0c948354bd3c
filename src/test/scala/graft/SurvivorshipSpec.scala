package graft

import org.apache.spark.sql.functions._

import graft.operators.Survivorship

class SurvivorshipSpec extends SparkSpec {
  init()

  import spark.implicits._

  private lazy val fixture = Seq(
    // cluster 1: longest-tie between "bbb" and "ccc" (→ "ccc", lex max);
    // lang mode-tie between "de" and "en" 2–2 (→ "de", value asc);
    // canonical = min id
    (1L, 1L, "bbb", "en", 10L),
    (2L, 1L, "ccc", "en", 30L),
    (3L, 1L, "aaaa", "de", 20L),
    (4L, 1L, "x", "de", 5L),
    // cluster 2: singleton — every rule returns the row's own values
    (9L, 2L, "solo", "fr", 7L)).toDF("id", "cl", "text", "lang", "n")

  test("golden record: longest/mode/max/min rules with pinned tie behavior") {
    val got = Survivorship.goldenRecord(
        fixture, "cl", "id",
        longestCols = Seq("text"), maxCols = Seq("n"), modeCols = Seq("lang"))
      .orderBy("cl")
      .as[(Long, Long, Long, String, Long, String)].collect().toSeq
    assert(got == Seq(
      (1L, 4L, 1L, "aaaa", 30L, "de"), // longest text, max n, mode-tie → 'de'
      (2L, 1L, 9L, "solo", 7L, "fr")))
  }

  test("longest-length ties break to the lexicographically largest value") {
    val df = Seq((1L, 1L, "bb"), (2L, 1L, "ab")).toDF("id", "cl", "t")
    val got = Survivorship.goldenRecord(df, "cl", "id", longestCols = Seq("t"))
      .select("t").head().getString(0)
    assert(got == "bb")
  }

  test("mode tie order is (count desc, value asc) — not the engine's native mode()") {
    val df = Seq((1L, 1L, "z"), (2L, 1L, "a"), (3L, 1L, "z"), (4L, 1L, "a"))
      .toDF("id", "cl", "v")
    val got = Survivorship.goldenRecord(df, "cl", "id", modeCols = Seq("v"))
      .select("v").head().getString(0)
    assert(got == "a")
  }

  test("partition invariance on real clusters") {
    val docs = graft.core.Tables(spark, sfSmoke, "documents")
      .withColumn("cl", pmod(col("doc_id"), lit(17)))
    val a = Survivorship.goldenRecord(docs, "cl", "doc_id",
        longestCols = Seq("text"), maxCols = Seq("n_chars"), modeCols = Seq("lang", "source"))
      .orderBy("cl").collect().toSeq
    val b = Survivorship.goldenRecord(docs.repartition(13), "cl", "doc_id",
        longestCols = Seq("text"), maxCols = Seq("n_chars"), modeCols = Seq("lang", "source"))
      .orderBy("cl").collect().toSeq
    assert(a == b && a.nonEmpty)
  }
}
