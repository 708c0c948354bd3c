package graft

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.operators.KeywordSearch

class KeywordSearchSpec extends SparkSpec {
  init()

  test("topK scores Σ tf·(N−df) on a hand-computed corpus") {
    import spark.implicits._
    // N = 4; df(a)=3, df(b)=2 → weight(a)=1, weight(b)=2
    val df = Seq(
      (1L, "a a a"), //            score 3·1        = 3, n_hit 1
      (2L, "a b"), //              score 1·1 + 1·2  = 3, n_hit 2
      (3L, "b b x a"), //          score 1·1 + 2·2  = 5, n_hit 2
      (4L, "x y z")) //            score 0 → filtered out
      .toDF("doc_id", "text")
    val r = KeywordSearch.topK(df, "doc_id", "text", Seq("a", "b"), k = 10).collect()
    assert(r.map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSeq ==
      Seq((3L, 2L, 5L), (1L, 1L, 3L), (2L, 2L, 3L))) // tie (1,2) breaks by id
  }

  test("topK equals a brute-force reference on the documents table") {
    import spark.implicits._
    val docs = Tables(spark, sfSmoke, "documents")
    val terms = Seq("spark", "vector")
    val got = KeywordSearch.topK(docs, "doc_id", "text", terms, k = 15)
      .as[(Long, Long, Long)].collect().toSeq

    // independent reference: collect and score in plain Scala
    val corpus = docs.select("doc_id", "text").as[(Long, String)].collect()
    val n = corpus.length.toLong
    val dfs = terms.map(t => t -> corpus.count(_._2.split(" ").contains(t)).toLong).toMap
    val want = corpus
      .map { case (id, text) =>
        val toks = text.split(" ").filter(_.nonEmpty)
        val tfs = terms.map(t => t -> toks.count(_ == t).toLong).toMap
        (id, terms.count(t => tfs(t) > 0).toLong,
          terms.map(t => tfs(t) * (n - dfs(t))).sum)
      }
      .filter(_._3 > 0)
      .sortBy { case (id, _, s) => (-s, id) }
      .take(15)
      .toSeq
    assert(got == want)
  }

  test("topK plan has no explode and one summary broadcast") {
    val docs = Tables(spark, sfSmoke, "documents")
    val plan = KeywordSearch.topK(docs, "doc_id", "text", Seq("spark"), k = 5)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Generate")) // no explode path
    assert(plan.contains("TakeOrderedAndProject")) // top-k, not a full sort
  }
}
