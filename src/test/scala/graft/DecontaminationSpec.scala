package graft

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.operators.Decontamination

class DecontaminationSpec extends SparkSpec {
  init()

  test("flags exactly the corpus docs sharing an n-gram with the eval set") {
    import spark.implicits._
    val eval = Seq((100L, "one two three four five six")).toDF("e_id", "e_text")
    val corpus = Seq(
      (1L, "zzz two three four five six yyy"), // shares "two three four five six"
      (2L, "one two three four"), // longest shared run is 4 < n
      (3L, "totally different words here now")) // disjoint
      .toDF("doc_id", "text")
    val r = Decontamination.flag(corpus, "doc_id", "text", eval, "e_id", "e_text", 5)
      .orderBy("doc_id").collect()
    assert(r.map(_.getLong(0)).toSeq == Seq(1L))
    assert(r(0).getAs[Long]("n_hit_grams") == 1)
    assert(r(0).getAs[Long]("n_eval_docs") == 1)
  }

  test("hit-gram and eval-doc counts are distinct counts") {
    import spark.implicits._
    val eval = Seq(
      (100L, "a b c d e f"), // grams: "a b c d e", "b c d e f"
      (200L, "a b c d e zz")) // gram "a b c d e" again
      .toDF("e_id", "e_text")
    val corpus = Seq((1L, "a b c d e f")).toDF("doc_id", "text")
    val r = Decontamination.flag(corpus, "doc_id", "text", eval, "e_id", "e_text", 5).head()
    assert(r.getAs[Long]("n_hit_grams") == 2) // both of doc 1's grams hit
    assert(r.getAs[Long]("n_eval_docs") == 2) // one gram shared with each eval doc
  }

  test("flagWithinTable matches a brute-force replay on the documents table") {
    val docs = Tables(spark, sfSmoke, "documents")
    val n = 5
    val evalEvery = 50
    val got = Decontamination
      .flagWithinTable(spark, docs, "doc_id", "text", n, evalEvery)
      .orderBy("doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // brute force: gram sets in plain Scala over the collected table
    val all = docs.select("doc_id", "text").collect().map { r =>
      val toks = r.getString(1).split(" ").filter(_.nonEmpty)
      r.getLong(0) -> toks.sliding(n).filter(_.length == n).map(_.mkString(" ")).toSet
    }
    val evalGrams = all.filter(_._1 % evalEvery == 0)
    val expected = all
      .filter(_._1 % evalEvery != 0)
      .flatMap { case (id, grams) =>
        val hits = evalGrams.filter { case (_, eg) => grams.exists(eg.contains) }
        if (hits.isEmpty) None
        else {
          val hitGrams = grams.filter(g => evalGrams.exists(_._2.contains(g)))
          Some((id, hitGrams.size.toLong, hits.length.toLong))
        }
      }
      .sortBy(_._1)
    assert(got.toSeq == expected.toSeq)
    assert(got.nonEmpty, "planted near-dup corpus should produce contamination hits")
  }

  test("eval grams are broadcast in the physical plan") {
    val docs = Tables(spark, sfSmoke, "documents")
    val plan = Decontamination
      .flagWithinTable(spark, docs, "doc_id", "text", 5, 50)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"expected a broadcast join over the eval gram set:\n$plan")
  }

  // ------------------------------------------------------- semantic tier

  private lazy val emb = Tables(spark, sfSmoke, "embeddings")

  /** Planted eval set: perturbed copies of vec_id < n (the q24
    * construction) — cosine ≈ 0.99997 to their source, ≤ ~0.48 to
    * everything else.
    */
  private def plantedEval(n: Int) =
    emb.filter(col("vec_id") < n).select(
      (col("vec_id") + 10000).as("eval_id"),
      zip_with(
        col("embedding"),
        sequence(lit(0), lit(63)),
        (x, i) =>
          (x.cast("double") +
            when(pmod(i, lit(2)) === 0, lit(0.003)).otherwise(lit(-0.003)))
            .cast("float")).as("eval_emb"))

  test("semantic decon (broadcast form) flags exactly the planted sources") {
    import spark.implicits._
    val got = Decontamination.flagSemantic(
        emb, "vec_id", "embedding", plantedEval(10), "eval_id", "eval_emb",
        tau = 0.99)
      .orderBy("vec_id")
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == (0L until 10L).map(v => (v, 1L, v + 10000L)))
  }

  test("semantic decon cell form: hits are a subset of the broadcast form's") {
    val full = Decontamination.flagSemantic(
      emb, "vec_id", "embedding", plantedEval(10), "eval_id", "eval_emb",
      tau = 0.99)
    val celled = Decontamination.flagSemanticCells(
      emb, "vec_id", "embedding", plantedEval(10), "eval_id", "eval_emb",
      tau = 0.99, nCells = 16)
    // every celled hit is a true hit with the same evidence (a same-cell
    // pair set is a subset of all pairs, and per-doc aggregates can only
    // shrink toward the same minimum eval id when both ids survive)
    assert(celled.join(full, Seq("vec_id")).count() == celled.count())
    assert(celled.exceptAll(full).isEmpty,
      "cell-form rows must be exactly the broadcast-form rows whose pair survived the cell")
  }

  test("semantic decon: empty eval set flags nothing in both forms") {
    val none = plantedEval(10).limit(0)
    assert(Decontamination.flagSemantic(
      emb, "vec_id", "embedding", none, "eval_id", "eval_emb", 0.99).isEmpty)
    assert(Decontamination.flagSemanticCells(
      emb, "vec_id", "embedding", none, "eval_id", "eval_emb", 0.99, 16).isEmpty)
  }

  test("semantic decon broadcast form: eval side is broadcast, corpus is not shuffled by eval") {
    val plan = Decontamination.flagSemantic(
        emb, "vec_id", "embedding", plantedEval(10), "eval_id", "eval_emb",
        tau = 0.99)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      s"expected the eval embeddings broadcast:\n$plan")
  }
}
