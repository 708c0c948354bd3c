package graft

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.operators.{Dedup, Salting, SimilarityJoin}
import graft.streaming.{SemiStreamSimilarityJoin, StreamingDedup}

/** Measured hot-key salting wired into the STREAMING probe paths (SURVEY
  * D4; round-13 verdict task 3): AQE is disabled under the stateful
  * streaming harness, so the probe joins must handle celebrity keys
  * themselves. These fixtures make one key pathologically hot and assert
  * (a) the salted regimes are bag-equal to the defaults, and (b) the hot
  * key's candidate product actually spreads over many partitions instead
  * of funneling through one task (per-partition row counts are the
  * deterministic proxy for task-time spread).
  */
class StreamSkewSaltingSpec extends SparkSpec {
  init()
  import spark.implicits._

  /** Skewed corpus: `nDup` docs share one text (every band signature is
    * identical — the hottest possible (band, bsig) keys), the rest unique.
    */
  private def skewedDocs(nDup: Int, nUnique: Int) = {
    val dupText = (1 to 12).map(i => s"dup$i").mkString(" ")
    val rows =
      (1 to nDup).map(i => (i.toLong, dupText)) ++
        (1 to nUnique).map(i =>
          ((nDup + i).toLong, (1 to 12).map(j => s"u${i}_$j").mkString(" ")))
    rows.toDF("doc_id", "text")
  }

  test("StreamingDedup: salted-shuffle probe is decision-identical to the broadcast probe") {
    val docs = skewedDocs(nDup = 60, nUnique = 120)
    val base = StreamingDedup.run(docs, "doc_id", "text", tau = 0.8, chunks = 3,
      compactEvery = 2)
      .orderBy("doc_id").collect().toSeq
    val salted = StreamingDedup.run(docs, "doc_id", "text", tau = 0.8, chunks = 3,
      compactEvery = 2, saltThreshold = 8L)
      .orderBy("doc_id").collect().toSeq
    assert(base == salted, "salted probe changed dedup decisions")
    assert(base.count(_.getLong(1) >= 0L) >= 55, "fixture lost its dup cluster")
  }

  test("hot (band, bsig) candidate product spreads across partitions under the salt") {
    // state side: 3000 rows of ONE hot (band, bsig) + 3000 cold; batch
    // side: 40 rows of the hot key — the unsalted shuffle join funnels the
    // whole 120k-row hot product through one hash partition
    val hot = (1L to 3000L).map(i => (i, 7, 42L)) ++
      (1L to 3000L).map(i => (3000L + i, (i % 5).toInt, 1000L + i))
    val state = hot.toDF("y_id", "band", "bsig")
    val batch = ((1L to 40L).map(i => (100000L + i, 7, 42L)) ++
      (1L to 40L).map(i => (200000L + i, (i % 5).toInt, 5000L + i)))
      .toDF("x_id", "band", "bsig")
    val factors = Salting.hotKeyFactors(
      state.select("band", "bsig"), Seq("band", "bsig"),
      threshold = 500L, maxSalts = 16, topN = 1024)
    assert(factors.count() == 1L, "exactly the hot key must measure hot")

    def maxShare(df: org.apache.spark.sql.DataFrame): Double = {
      val per = df.groupBy(spark_partition_id().as("pid")).count()
        .select("count").as[Long].collect()
      per.max.toDouble / per.sum
    }
    val plain = state.join(batch, Seq("band", "bsig")).select("x_id", "y_id")
    val salted = Salting
      .adaptiveSaltedJoin(state, batch, Seq("band", "bsig"), factors)
      .select("x_id", "y_id")
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
    // the streaming regime this models cannot broadcast (batch too big)
    // and runs without AQE — force both joins onto the un-coalesced
    // shuffle path for the spread measurement
    val prevB = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevA = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val (pShare, sShare) =
      try (maxShare(plain), maxShare(salted))
      finally {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevB)
        spark.conf.set("spark.sql.adaptive.enabled", prevA)
      }
    // plain: the hot product (3000×40 = 120k of ~123k rows) sits in one
    // partition; salted: spread over min(16, ceil(3000/500)) = 6 salts
    assert(pShare > 0.9, s"fixture not skewed enough: plain max share $pShare")
    assert(sShare < 0.5, s"salted hot key still funnels: max share $sShare")
  }

  test("SemiStreamSimilarityJoin: index-measured salting leaves the verified pairs unchanged") {
    val docs = Tables(spark, sfSmoke, "documents")
    val base = SemiStreamSimilarityJoin.run(
      docs, "doc_id", "text", tau = 0.8, chunks = 3,
      windowRule = graft.streaming.FixedRule(2))
    // threshold 2: plenty of segment signatures measure hot at sf0.001, so
    // the salted plan genuinely engages on real probes
    val salted = SemiStreamSimilarityJoin.run(
      docs, "doc_id", "text", tau = 0.8, chunks = 3,
      windowRule = graft.streaming.FixedRule(2), saltHotAbove = 2L)
    val b = base.pairs.select("x_id", "y_id")
    val s = salted.pairs.select("x_id", "y_id")
    assert(s.exceptAll(b).isEmpty && b.exceptAll(s).isEmpty)
    assert(s.count() > 0)
  }

  test("StreamingDedup decisions still match the brute-force oracle under salting") {
    val docs = skewedDocs(nDup = 25, nUnique = 50)
    val got = StreamingDedup.run(docs, "doc_id", "text", tau = 0.8, chunks = 2,
      saltThreshold = 4L)
    // brute-force replay of the arrival-order min-dup definition
    val chunkOf = graft.operators.Sampling.hashUniform(col("doc_id")) * 2
    val ordered = docs
      .withColumn("chunk", floor(chunkOf).cast("int"))
      .select("doc_id", "text", "chunk")
    val toks = SimilarityJoin.tokenize(ordered, "doc_id", "text")
      .join(ordered.select(col("doc_id").as("sid"), col("chunk")), "sid")
    val pairs = toks.as("x").join(toks.as("y"),
        col("y.chunk") < col("x.chunk") ||
          (col("y.chunk") === col("x.chunk") && col("y.sid") < col("x.sid")))
      .filter(
        size(array_intersect(col("x.toks"), col("y.toks"))).cast("double") /
          size(array_union(col("x.toks"), col("y.toks"))) >= 0.8)
      .groupBy(col("x.sid").as("doc_id"))
      .agg(min(col("y.sid")).as("dup_of"))
    val want = ordered.select(col("doc_id"))
      .join(pairs, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("dup_of"), lit(-1L)).as("dup_of"))
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }
}
