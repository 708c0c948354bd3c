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

  test("row-group pruning is REAL: rare-phrase scans read a fraction of the index") {
    // token-sorted parquet with deliberately small row groups, so footer
    // min/max stats give the pushed token filters something to skip; the
    // scan nodes' output-row metrics then MEASURE the pruning (rows of
    // surviving row groups only) instead of trusting the plan text
    val corpus = spark.read.parquet(s"$sfSmoke/documents.parquet")
    val dir = java.nio.file.Files.createTempDirectory("graft-phrprune-").toString + "/idx"
    KeywordSearch.buildPostings(corpus, "doc_id", "text")
      .repartitionByRange(4, col("token")).sortWithinPartitions("token")
      .write.option("parquet.block.size", 64 * 1024).parquet(dir)
    val postings = spark.read.parquet(dir)
    val total = postings.count()

    // two rare tokens (posting lists in the low tail), found from the index
    import spark.implicits._
    val rare = postings.groupBy("token").count().orderBy(col("count"), col("token"))
      .limit(2).select("token").as[String].collect().toSeq
    assert(rare.size == 2)

    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val q = KeywordSearch.phraseCountIndexed(postings, rare)
      q.collect()
      val scans = q.queryExecution.executedPlan.collect {
        case sc: org.apache.spark.sql.execution.FileSourceScanExec => sc
      }
      assert(scans.nonEmpty, "expected parquet scans in the index path")
      val readRows = scans.map(_.metrics("numOutputRows").value).sum
      // granularity bound: with ~64 KB row groups the index splits into
      // ~8 groups, and each of the two token scans may read up to two —
      // well under a third of the index, vs ALL of it without pruning
      assert(
        readRows * 3 < total,
        s"rare-phrase index reads must row-group-prune: read $readRows of $total")
      val planStr = q.queryExecution.executedPlan.toString
      assert(planStr.contains("PushedFilters") && planStr.contains("token"),
        s"token filters must push to the scan:\n$planStr")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }
}
