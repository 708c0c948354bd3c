package graft

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.operators.Decontamination

class FuzzyDecontaminationSpec extends SparkSpec {
  init()

  import spark.implicits._

  test("fuzzy flags match brute-force exact Jaccard on the corpus") {
    val docs = Tables(spark, sfSmoke, "documents")
    val eval = docs.filter(pmod(col("doc_id"), lit(50)) === 0)
      .select(col("doc_id").as("__e_id"), col("text").as("__e_text"))
    val corpus = docs.filter(pmod(col("doc_id"), lit(50)) =!= 0)
    val got = Decontamination
      .flagFuzzy(corpus, "doc_id", "text", eval, "__e_id", "__e_text", tau = 0.8)
      .select("doc_id", "eval_id", "inter", "uni")

    val tok = (c: org.apache.spark.sql.Column) =>
      array_distinct(filter(split(c, " "), t => length(t) > 0))
    val co = corpus.select(col("doc_id"), tok(col("text")).as("toks"))
    val ev = eval.select(col("__e_id").as("eval_id"), tok(col("__e_text")).as("e_toks"))
    val brute = co.crossJoin(ev)
      .withColumn("inter", size(array_intersect(col("toks"), col("e_toks"))).cast("long"))
      .withColumn("uni", (size(col("toks")) + size(col("e_toks"))).cast("long") - col("inter"))
      .filter(col("inter").cast("double") >= col("uni") * 0.8)
      .select("doc_id", "eval_id", "inter", "uni")

    assert(got.count() > 0)
    assert(got.exceptAll(brute).isEmpty && brute.exceptAll(got).isEmpty)
  }

  test("fuzzy catches a shuffled paraphrase that exact n-gram matching misses") {
    // same token multiset, different order: zero shared 5-grams, Jaccard 1.0
    val eval = Seq((100L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"))
      .toDF("eid", "etext")
    val corpus = Seq((1L, "kappa iota theta eta zeta epsilon delta gamma beta alpha"))
      .toDF("id", "text")
    val exact = Decontamination.flag(corpus, "id", "text", eval, "eid", "etext", n = 5)
    val fuzzy = Decontamination.flagFuzzy(corpus, "id", "text", eval, "eid", "etext", tau = 0.8)
    assert(exact.isEmpty)
    assert(fuzzy.count() == 1)
    val r = fuzzy.collect()(0)
    assert(r.getLong(2) == 10 && r.getLong(3) == 10) // inter == uni == 10
  }
}
