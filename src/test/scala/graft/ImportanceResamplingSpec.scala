package graft

import org.apache.spark.sql.functions._

import graft.operators.ImportanceResampling

/** DSIR resampling properties the oracle can't express: target-affinity
  * ordering, target exclusion, determinism, and the TVF round-trip.
  */
class ImportanceResamplingSpec extends SparkSpec {
  init()
  import spark.implicits._

  // target speaks vocab A; candidate 100 is pure-A, 101 mixed, 102 pure-B
  private val rows = Seq(
    (0L, "alpha beta gamma alpha beta", true),
    (1L, "beta gamma alpha beta gamma", true),
    (100L, "alpha beta gamma alpha beta gamma", false),
    (101L, "alpha beta zeta eta theta iota", false),
    (102L, "zeta eta theta iota kappa zeta eta", false))

  test("target-affinity ordering and target exclusion") {
    val df = rows.toDF("id", "text", "is_t")
    val out = ImportanceResampling
      .resampleTopK(df, "id", "text", col("is_t"), n = 2, nBuckets = 256,
        scale = 1000000L, k = 10)
      .orderBy("rk")
      .select("id", "score", "rk").as[(Long, Long, Int)].collect()
    assert(out.map(_._1).toSet == Set(100L, 101L, 102L), "all and only candidates")
    val score = out.map(r => r._1 -> r._2).toMap
    assert(score(100L) > score(101L), s"pure-target-vocab doc must outscore mixed: $score")
    assert(score(101L) > score(102L), s"mixed doc must outscore pure-off-vocab: $score")
    assert(out.head._1 == 100L, "rank 1 = most target-like")
  }

  test("deterministic across runs") {
    val df = rows.toDF("id", "text", "is_t")
    def run() = ImportanceResampling
      .resampleTopK(df, "id", "text", col("is_t"), n = 2, nBuckets = 64,
        scale = 1000000L, k = 10)
      .orderBy("rk").collect().toSeq
    assert(run() == run())
  }

  test("dsir_topk TVF round-trips the Scala path") {
    val docs = core.Tables(spark, sfSmoke, "documents")
      .withColumn("is_t", col("source") === "src0")
    docs.createOrReplaceTempView("dsir_docs")
    val viaSql = spark.sql(
      "SELECT * FROM dsir_topk('dsir_docs', 'doc_id', 'text', 'is_t', 2, 256, 1000000, 20)")
      .orderBy("rk").collect().toSeq
    val viaScala = ImportanceResampling
      .resampleTopK(docs, "doc_id", "text", col("is_t"), n = 2, nBuckets = 256,
        scale = 1000000L, k = 20)
      .orderBy("rk").collect().toSeq
    assert(viaSql == viaScala)
    assert(viaScala.size == 20)
  }
}
