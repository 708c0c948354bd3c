package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.BloomFilter
import graft.operators.Decontamination

/** Bloom build/probe invariants + the flagBloom ≡ flag equality that makes
  * the Bloom a certified pure pre-filter.
  */
class BloomFilterSpec extends SparkSpec {
  init()
  import spark.implicits._

  test("no false negatives: every inserted value probes true") {
    val items = (0 until 5000).map(i => s"item-$i-${i * 31}")
    val df = items.toDF("v")
    val bloom = BloomFilter.build(df, "v", fpp = 0.01, expectedItems = items.size)
    items.foreach { s =>
      assert(BloomFilter.mightContain(bloom.bits, bloom.k, UTF8String.fromString(s)))
    }
  }

  test("empty input builds the all-zero filter instead of throwing") {
    val empty = Seq.empty[String].toDF("v")
    val bloom = BloomFilter.build(empty, "v", fpp = 0.01, expectedItems = 100)
    assert(bloom.saturation == 0.0)
    assert(!BloomFilter.mightContain(bloom.bits, bloom.k, UTF8String.fromString("anything")))
  }

  test("false-positive rate is near the configured fpp") {
    val items = (0 until 20000).map(i => s"in-$i")
    val df = items.toDF("v")
    val bloom = BloomFilter.build(df, "v", fpp = 0.01, expectedItems = items.size)
    val probes = (0 until 20000).map(i => s"out-$i")
    val fp = probes.count(s =>
      BloomFilter.mightContain(bloom.bits, bloom.k, UTF8String.fromString(s)))
    val rate = fp.toDouble / probes.size
    assert(rate < 0.03, s"false-positive rate $rate way over configured 0.01")
    assert(bloom.saturation < 0.55, s"saturation ${bloom.saturation}")
  }

  test("probe works as a codegen Column inside a plan") {
    val items = Seq("alpha", "beta", "gamma")
    val bloom = BloomFilter.build(items.toDF("v"), "v", fpp = 0.01, expectedItems = 3)
    val probes = Seq("alpha", "delta", "gamma", "zeta").toDF("p")
    val kept = probes
      .filter(bloom.mightContainCol(spark, col("p")))
      .as[String].collect().toSet
    // delta/zeta COULD false-positive, but alpha/gamma MUST survive
    assert(Set("alpha", "gamma").subsetOf(kept))
  }

  test("flagBloom equals flag exactly, both verify regimes") {
    val docs = core.Tables(spark, sfSmoke, "documents")
    val eval = docs.filter(pmod(col("doc_id"), lit(20)) === 0)
      .select(col("doc_id").as("eid"), col("text").as("etext"))
    val corpus = docs.filter(pmod(col("doc_id"), lit(20)) =!= 0)
    val exact = Decontamination
      .flag(corpus, "doc_id", "text", eval, "eid", "etext", n = 3)
      .orderBy("doc_id").collect().toSeq
    for (bcast <- Seq(true, false)) {
      val got = Decontamination
        .flagBloom(corpus, "doc_id", "text", eval, "eid", "etext",
          n = 3, fpp = 0.01, broadcastJoin = bcast)
        .orderBy("doc_id").collect().toSeq
      assert(got == exact, s"broadcastJoin=$bcast diverged")
    }
    assert(exact.nonEmpty, "fixture must actually flag something")
  }

  test("decontaminate_bloom TVF round-trips the Scala path") {
    val docs = core.Tables(spark, sfSmoke, "documents")
    docs.filter(pmod(col("doc_id"), lit(20)) =!= 0).createOrReplaceTempView("bl_corpus")
    docs.filter(pmod(col("doc_id"), lit(20)) === 0)
      .select(col("doc_id").as("eid"), col("text").as("etext"))
      .createOrReplaceTempView("bl_eval")
    val viaSql = spark.sql(
      "SELECT * FROM decontaminate_bloom('bl_corpus', 'doc_id', 'text', " +
        "'bl_eval', 'eid', 'etext', 3, 0.01)")
      .orderBy("doc_id").collect().toSeq
    val viaScala = Decontamination
      .flagBloom(
        spark.table("bl_corpus"), "doc_id", "text",
        spark.table("bl_eval"), "eid", "etext",
        n = 3, fpp = 0.01, broadcastJoin = false)
      .orderBy("doc_id").collect().toSeq
    assert(viaSql == viaScala)
    assert(viaScala.nonEmpty)
  }
}
