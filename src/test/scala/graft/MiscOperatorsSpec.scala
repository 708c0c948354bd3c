package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.core.Tables
import graft.operators.{MinHashSketch, Salting, SimilarityJoin}
import graft.streaming.Sources

class MiscOperatorsSpec extends SparkSpec {
  init()

  test("rate-source union streams rows from all sources (S1)") {
    val stream = Sources.rateUnion(spark, sources = 3, rowsPerSecond = 50)
    val ckpt = java.nio.file.Files.createTempDirectory("graft-rate-").toString
    val (metrics, detach) = Sources.attachMetricsListener(spark)
    val seen = new java.util.concurrent.atomic.AtomicLong(0)
    val perSource = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    val q = stream.writeStream
      .foreachBatch { (df: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        df.groupBy("source_id").count().collect().foreach { r =>
          perSource.merge(r.getInt(0), r.getLong(1), (a, b) => a + b)
          seen.addAndGet(r.getLong(1))
          ()
        }
      }
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.ProcessingTime("500 milliseconds"))
      .start()
    try {
      val deadline = System.nanoTime() + 30e9.toLong
      // wait for BOTH assert conditions: 30 rows AND all three sources —
      // a first micro-batch can satisfy the row count before a lagging
      // source's first rows arrive (observed flake on a loaded box)
      while ((seen.get() < 30 || perSource.size() < 3) && System.nanoTime() < deadline)
        Thread.sleep(200)
    } finally q.stop()
    detach()
    assert(seen.get() >= 30, s"only ${seen.get()} rows arrived")
    assert(perSource.size() == 3, s"sources seen: $perSource")
    // S10: the listener captured per-batch metrics
    assert(!metrics.isEmpty, "metrics listener recorded nothing")
  }

  test("MinHash sketch aggregator estimates group similarity (§2.10 Aggregator)") {
    import spark.implicits._
    val sketch = new MinHashSketch(128).toColumn
    val docs = Tables(spark, sfSmoke, "documents")
    val toks = SimilarityJoin.tokenize(docs, "doc_id", "text")
    // two groups with identical content → identical sketches; disjoint
    // content → low similarity
    val ds = toks.select(col("sid"), col("toks"))
      .as[(Long, Seq[String])]
    val sketches = ds
      .groupByKey { case (sid, _) => (sid % 2).toInt }
      .mapValues(_._2)
      .agg(sketch.name("sk"))
      .collect().toMap
    val selfSim = MinHashSketch.estimateJaccard(sketches(0), sketches(0))
    val crossSim = MinHashSketch.estimateJaccard(sketches(0), sketches(1))
    assert(selfSim == 1.0)
    // the two halves of the corpus share most vocabulary → high-but-<1;
    // mainly assert the estimator is inside [0,1] and not degenerate
    assert(crossSim >= 0.0 && crossSim <= 1.0)

    // hand-built disjoint groups: estimator must be ~0
    val a = Seq(Seq("a1", "a2", "a3"), Seq("a2", "a4")).toDF("toks")
      .as[Seq[String]].select(sketch.name("sk")).head()
    val b = Seq(Seq("z1", "z2"), Seq("z3")).toDF("toks")
      .as[Seq[String]].select(sketch.name("sk")).head()
    assert(MinHashSketch.estimateJaccard(a, b) < 0.1)
  }

  test("salted join equals the plain join and spreads hot keys (D4)") {
    import spark.implicits._
    // pathological skew: one key owns 90% of the probe side
    val probe = spark.range(10000)
      .select(when(col("id") < 9000, lit(7L)).otherwise(col("id")).as("k"), col("id").as("v"))
    val build = spark.range(100).select(col("id").as("k"), (col("id") * 10).as("w"))
    val plain = probe.join(build, "k")
    val salted = Salting.saltedJoin(probe, build, "k", salts = 16)
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
    // the hot key's probe rows spread across many salt values
    val spread = Salting.saltProbe(probe.filter(col("k") === 7), 16)
      .select("__salt").distinct().count()
    assert(spread >= 12, s"hot key only spread over $spread salts")
  }
}
