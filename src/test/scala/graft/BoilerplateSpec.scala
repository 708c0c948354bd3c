package graft

import graft.operators.Boilerplate

class BoilerplateSpec extends SparkSpec {
  init()
  import spark.implicits._

  // "cookie notice" appears in 3 docs of site A (template); "unique ..."
  // lines are content; site B repeats the same line but only twice.
  private def docs = Seq(
    ("a1", "A", "cookie notice\nunique alpha\ncookie notice"),
    ("a2", "A", "cookie notice\nunique beta"),
    ("a3", "A", " cookie notice \nunique gamma\n\n  "),
    ("b1", "B", "cookie notice\ncontent one"),
    ("b2", "B", "cookie notice\ncontent two"),
    ("b3", "B", "content three")).toDF("doc_id", "source", "text")

  test("frequentLines counts distinct docs per source, trimmed") {
    val got = Boilerplate
      .frequentLines(docs, "doc_id", "text", "source", "\n", minDocs = 3)
      .as[(String, String, Long)].collect().toSeq
    // a1's duplicate occurrence counts once; a3's padded copy trims equal;
    // site B has only 2 docs with the line — below the floor
    assert(got == Seq(("A", "cookie notice", 3L)))
  }

  test("removeLines drops every occurrence and reassembles in order") {
    val got = Boilerplate
      .removeLines(docs, "doc_id", "text", "source", "\n", minDocs = 3)
      .orderBy("id").as[(String, Long, Long, String)].collect().toSeq
    assert(got == Seq(
      ("a1", 3L, 2L, "unique alpha"),
      ("a2", 2L, 1L, "unique beta"),
      ("a3", 2L, 1L, "unique gamma"),
      ("b1", 2L, 0L, "cookie notice\ncontent one"),
      ("b2", 2L, 0L, "cookie notice\ncontent two"),
      ("b3", 1L, 0L, "content three")))
  }

  test("a fully templated doc survives with empty text; a blank doc passes at zero lines") {
    val d = Seq(
      ("x1", "S", "tpl"), ("x2", "S", "tpl"), ("x3", "S", "tpl"),
      ("x4", "S", "   ")).toDF("doc_id", "source", "text")
    val got = Boilerplate.removeLines(d, "doc_id", "text", "source", "\n", 3)
      .orderBy("id").as[(String, Long, Long, String)].collect().toSeq
    assert(got == Seq(
      ("x1", 1L, 1L, ""), ("x2", 1L, 1L, ""), ("x3", 1L, 1L, ""),
      ("x4", 0L, 0L, "")))
  }

  test("delimiters are literal, not regex") {
    val d = Seq(
      ("y1", "S", "one|.|two"), ("y2", "S", "one|.|three"),
      ("y3", "S", "one|.|four")).toDF("doc_id", "source", "text")
    val got = Boilerplate.frequentLines(d, "doc_id", "text", "source", "|.|", 3)
      .as[(String, String, Long)].collect().toSeq
    assert(got == Seq(("S", "one", 3L)))
  }

  test("frequent_lines TVF round-trips the Scala path") {
    docs.createOrReplaceTempView("bp_docs")
    val tvf = spark.sql(
      "SELECT * FROM frequent_lines('bp_docs', 'doc_id', 'text', 'source', '\n', 3)")
      .collect().toSeq
    val direct = Boilerplate
      .frequentLines(docs, "doc_id", "text", "source", "\n", 3).collect().toSeq
    assert(tvf == direct)
  }
}
