package graft

import org.apache.spark.sql.functions._

import graft.operators.KeywordSearch

class PhraseSearchSpec extends SparkSpec {
  init()

  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "a b c a b c a b"),   // "a b" x3 at 1,4,7; "a b c" x2
    (2L, "a a a a"),            // "a a" OVERLAPPING x3 at 1,2,3
    (3L, "b c"),                // no "a b"
    (4L, "a"),                  // shorter than the phrase
    (5L, "x a b")               // "a b" x1 at 2
  ).toDF("doc_id", "text")

  test("scan path: overlapping occurrences, first positions, short docs") {
    val ab = KeywordSearch.phraseCount(docs, "doc_id", "text", Seq("a", "b"))
      .as[(Long, Long, Long)].collect().toSet
    assert(ab == Set((1L, 3L, 1L), (5L, 1L, 2L)))
    val aa = KeywordSearch.phraseCount(docs, "doc_id", "text", Seq("a", "a"))
      .as[(Long, Long, Long)].collect().toSet
    assert(aa == Set((2L, 3L, 1L)))
    val abc = KeywordSearch.phraseCount(docs, "doc_id", "text", Seq("a", "b", "c"))
      .as[(Long, Long, Long)].collect().toSet
    assert(abc == Set((1L, 2L, 1L)))
  }

  test("index path equals the scan path (fixture and real corpus)") {
    val postings = KeywordSearch.buildPostings(docs, "doc_id", "text")
    for (ph <- Seq(Seq("a", "b"), Seq("a", "a"), Seq("a", "b", "c"))) {
      val scan = KeywordSearch.phraseCount(docs, "doc_id", "text", ph)
        .select(col("doc_id").as("id"), col("n_occ"), col("first_pos"))
      val idx = KeywordSearch.phraseCountIndexed(postings, ph)
      assert(
        scan.exceptAll(idx).isEmpty && idx.exceptAll(scan).isEmpty,
        s"paths diverge for $ph")
    }
    val corpus = spark.read.parquet(s"$sfSmoke/documents.parquet")
    val cp = KeywordSearch.buildPostings(corpus, "doc_id", "text")
    val ph = Seq("value", "table")
    val scanC = KeywordSearch.phraseCount(corpus, "doc_id", "text", ph)
      .select(col("doc_id").as("id"), col("n_occ"), col("first_pos"))
    val idxC = KeywordSearch.phraseCountIndexed(cp, ph)
    assert(scanC.exceptAll(idxC).isEmpty && idxC.exceptAll(scanC).isEmpty)
  }

  test("token-sorted parquet index prunes: pushed filter reaches the scan") {
    val dir = java.nio.file.Files.createTempDirectory("graft-phrspec-").toString + "/idx"
    KeywordSearch.buildPostings(docs, "doc_id", "text")
      .repartitionByRange(col("token")).sortWithinPartitions("token")
      .write.parquet(dir)
    val postings = spark.read.parquet(dir)
    val plan = KeywordSearch.phraseCountIndexed(postings, Seq("a", "b"))
      .queryExecution.executedPlan.toString
    assert(
      plan.contains("PushedFilters") &&
        (plan.contains("EqualTo(token,a)") || plan.contains("token")),
      s"token filter must push to the parquet scan:\n$plan")
  }

  test("phrase_count TVF matches the operator") {
    docs.createOrReplaceTempView("phr_docs")
    val sqlDf = spark.sql(
      "SELECT * FROM phrase_count('phr_docs', 'doc_id', 'text', 'a b')")
    val scalaDf = KeywordSearch.phraseCount(docs, "doc_id", "text", Seq("a", "b"))
    assert(sqlDf.columns.toSeq == scalaDf.columns.toSeq)
    assert(sqlDf.exceptAll(scalaDf).isEmpty && scalaDf.exceptAll(sqlDf).isEmpty)
  }
}
