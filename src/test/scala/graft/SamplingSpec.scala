package graft

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.operators.Sampling

class SamplingSpec extends SparkSpec {
  init()

  private lazy val docs = Tables(spark, sfSmoke, "documents")

  test("hash split: deterministic, exhaustive, fractions in tolerance") {
    val s1 = Sampling.hashSplit(docs, "doc_id", Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    val s2 = Sampling.hashSplit(docs, "doc_id", Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    // same assignment on re-run (no RNG state)
    assert(s1.select("doc_id", "split").exceptAll(s2.select("doc_id", "split")).isEmpty)
    val counts = s1.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = docs.count().toDouble
    assert(counts.values.sum == n.toLong) // every row lands somewhere
    assert(math.abs(counts.getOrElse("train", 0L) / n - 0.8) < 0.06, counts.toString)
    assert(math.abs(counts.getOrElse("val", 0L) / n - 0.1) < 0.05, counts.toString)
  }

  test("hash split: assignment independent of the rest of the corpus") {
    // incremental-ingest stability: a record's split never changes when
    // other records appear
    val half = docs.filter(col("doc_id") % 2 === 0)
    val full = Sampling.hashSplit(docs, "doc_id", Seq("a" -> 0.5, "b" -> 0.5))
      .filter(col("doc_id") % 2 === 0).select("doc_id", "split")
    val part = Sampling.hashSplit(half, "doc_id", Seq("a" -> 0.5, "b" -> 0.5))
      .select("doc_id", "split")
    assert(full.exceptAll(part).isEmpty && part.exceptAll(full).isEmpty)
  }

  test("stratified cap: bound respected, deterministic, subset of input") {
    import spark.implicits._
    val df = (1L to 1000L).map(i => (i, s"s${i % 3}")).toDF("id", "src")
    val capped = Sampling.stratifiedCap(df, "src", "id", 50)
    val per = capped.groupBy("src").count().as[(String, Long)].collect().toMap
    assert(per.values.forall(_ == 50), per.toString) // each stratum has > 50 inputs
    val again = Sampling.stratifiedCap(df, "src", "id", 50)
    assert(capped.exceptAll(again).isEmpty && again.exceptAll(capped).isEmpty)
    assert(capped.exceptAll(df).isEmpty) // selection only, rows unchanged
  }

  test("weighted sample: per-stratum rates, nested survivors, isolation") {
    import spark.implicits._
    val df = (1L to 3000L).map(i => (i, s"s${i % 3}")).toDF("id", "src")
    val kept = Sampling.weightedSample(df, "id", "src",
      Seq("s0" -> 0.8, "s1" -> 0.4), defaultRate = 0.1)
    val per = kept.groupBy("src").count().as[(String, Long)].collect().toMap
    // 1000 rows per stratum; MD5-uniform keeps ≈ rate within a loose band
    assert(per("s0") > 700 && per("s0") < 900, per.toString)
    assert(per("s1") > 300 && per("s1") < 500, per.toString)
    assert(per("s2") > 50 && per("s2") < 160, per.toString)
    // lowering a rate yields a SUBSET (same hash, smaller threshold)
    val fewer = Sampling.weightedSample(df, "id", "src",
      Seq("s0" -> 0.4, "s1" -> 0.4), defaultRate = 0.1)
    assert(fewer.filter($"src" === "s0").exceptAll(kept.filter($"src" === "s0")).isEmpty)
    // ...and other strata are untouched by s0's retune
    assert(fewer.filter($"src" =!= "s0").exceptAll(kept.filter($"src" =!= "s0")).isEmpty &&
      kept.filter($"src" =!= "s0").exceptAll(fewer.filter($"src" =!= "s0")).isEmpty)
    // deterministic across runs
    val again = Sampling.weightedSample(df, "id", "src",
      Seq("s0" -> 0.8, "s1" -> 0.4), defaultRate = 0.1)
    assert(kept.exceptAll(again).isEmpty && again.exceptAll(kept).isEmpty)
  }
}
