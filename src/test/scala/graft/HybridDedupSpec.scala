package graft

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.operators.{Dedup, SimilarityJoin, SimilaritySearch}

class HybridDedupSpec extends SparkSpec {
  init()

  import spark.implicits._

  test("evidence tiers merge: text links A-B, embeddings link B-C, cluster is {A,B,C}") {
    val docs = Seq(
      (1L, "w1 w2 w3 w4 w5"),  // A: text-dup of B
      (2L, "w5 w4 w3 w2 w1"),  // B
      (3L, "zz yy xx ww vv"),  // C: token-disjoint from B, same embedding
      (4L, "k1 k2 k3 k4 k5")   // D: unrelated
    ).toDF("id", "text")
    val e1 = Array(1f, 0f, 0f, 0f)
    val e2 = Array(0f, 1f, 0f, 0f)
    val vecs = Seq(
      (2L, e2.toSeq), (3L, e2.toSeq), // B and C share an embedding
      (1L, e1.toSeq), (4L, Array(0f, 0f, 1f, 0f).toSeq)
    ).toDF("vid", "emb")
    val tokens = SimilarityJoin.tokenize(docs, "id", "text")
    val out = Dedup.hybridDedup(tokens, vecs, tauText = 0.8, tauSem = 0.985, nCells = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(1L) == 1L && out(2L) == 1L && out(3L) == 1L, out.toString)
    assert(out(4L) == 4L)
  }

  test("corpus: hybrid clusters refine-merge the text clusters, never split them") {
    val docs = Tables(spark, sfSmoke, "documents")
    val tokens = SimilarityJoin.tokenize(docs, "doc_id", "text")
    val vecs = Tables(spark, sfSmoke, "embeddings")
      .select(col("vec_id").as("vid"), col("embedding").as("emb"))
    val text = Dedup.minhashDedup(tokens, 0.8)
      .select(col("sid"), col("rep").as("text_rep"))
    val hybrid = Dedup.hybridDedup(tokens, vecs, 0.8, 0.985)
    // adding edges can only merge components: two docs sharing a text rep
    // must share a hybrid rep
    val joined = text.join(hybrid, "sid")
    val split = joined.groupBy("text_rep")
      .agg(countDistinct("rep").as("k"))
      .filter(col("k") > 1)
    assert(split.isEmpty)
    assert(hybrid.count() == docs.count())
  }

  test("cellPairs emits exactly the within-cell cosine pairs semanticDedup decides on") {
    val vecs = Tables(spark, sfSmoke, "embeddings")
      .select(col("vec_id").as("vid"), col("embedding").as("emb"))
    val pairs = SimilaritySearch.cellPairs(vecs, 0.985)
    val dupOf = SimilaritySearch.semanticDedup(vecs, 0.985)
      .filter(col("dup_of") =!= -1L)
    // every dup_of decision is the min partner among that vector's pairs
    val minPartner = pairs.groupBy("x_id").agg(min("y_id").as("m"))
    val mismatch = dupOf.join(minPartner, col("vid") === col("x_id"), "left")
      .filter(col("dup_of") =!= col("m"))
    assert(mismatch.isEmpty)
  }
}
