package graft

import graft.core.Tables
import graft.operators.SimilarityJoin

/** The SQL surface installed by GraftExtensions (SparkSpec builds the
  * session with `spark.sql.extensions=graft.GraftExtensions`).
  */
class GraftExtensionsSpec extends SparkSpec {
  init()

  test("similarity_join TVF round-trips to the Scala prefix self-join exactly") {
    Tables(spark, sfSmoke, "documents").createOrReplaceTempView("sj_docs")
    val viaSql = spark.sql(
      "SELECT * FROM similarity_join('sj_docs', 'doc_id', 'text', 0.8)")
    val viaScala = SimilarityJoin.prefixSelfJoin(
      Tables(spark, sfSmoke, "documents"), "doc_id", "text", 0.8)
    assert(viaSql.columns.toSeq == viaScala.columns.toSeq)
    assert(viaSql.count() == viaScala.count())
    assert(viaSql.exceptAll(viaScala).isEmpty && viaScala.exceptAll(viaSql).isEmpty)
  }

  test("similarity_join TVF composes downstream: aggregation over the join") {
    Tables(spark, sfSmoke, "documents").createOrReplaceTempView("sj_docs2")
    val n = spark.sql(
      """SELECT count(*) AS n
        |FROM similarity_join('sj_docs2', 'doc_id', 'text', 0.8)
        |WHERE jacc >= 0.9""".stripMargin).collect()(0).getLong(0)
    val expected = SimilarityJoin.prefixSelfJoin(
        Tables(spark, sfSmoke, "documents"), "doc_id", "text", 0.8)
      .filter("jacc >= 0.9").count()
    assert(n == expected)
  }

  test("containment_join TVF round-trips to the Scala containment self-join exactly") {
    Tables(spark, sfSmoke, "documents").createOrReplaceTempView("cj_docs")
    val viaSql = spark.sql(
      "SELECT * FROM containment_join('cj_docs', 'doc_id', 'text', 0.9)")
    val viaScala = SimilarityJoin.containmentSelfJoin(
      Tables(spark, sfSmoke, "documents"), "doc_id", "text", 0.9)
    assert(viaSql.columns.toSeq == viaScala.columns.toSeq)
    assert(viaSql.count() == viaScala.count())
    assert(viaSql.exceptAll(viaScala).isEmpty && viaScala.exceptAll(viaSql).isEmpty)
  }

  test("similarity_join TVF rejects a non-literal table argument") {
    val e = intercept[Exception] {
      spark.sql("SELECT * FROM similarity_join(1, 'a', 'b', 0.8)").collect()
    }
    assert(e.getMessage.contains("string literal"), e.getMessage)
  }

  test("intersect_size resolves in fresh sessions through the extensions") {
    val fresh = spark.newSession()
    val got = fresh.sql(
      "SELECT intersect_size(array('a','b','c'), array('b','c','d')) AS n")
      .collect()(0).getInt(0)
    assert(got == 2)
  }

  test("simhash64 / minhash_bands / lsh_signature resolve through the extensions") {
    val fresh = spark.newSession()
    val fp = fresh.sql("SELECT simhash64(array('a','b')) AS fp").collect()(0).getLong(0)
    val fp2 = spark.sql("SELECT simhash64(array('a','b')) AS fp").collect()(0).getLong(0)
    assert(fp == fp2) // deterministic across sessions
    val nBands = fresh.sql("SELECT size(minhash_bands(array('a','b'), 32, 3)) AS n")
      .collect()(0).getInt(0)
    assert(nBands == 32)
    val nTables = fresh.sql(
      "SELECT size(lsh_signature(CAST(array(0.1, -0.2) AS ARRAY<FLOAT>), 16, 8)) AS n")
      .collect()(0).getInt(0)
    assert(nTables == 16)
  }
}
