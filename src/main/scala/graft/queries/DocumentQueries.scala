package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.operators.SimilarityJoin

/** Document/LLM-pipeline query pack over the `documents` table: similarity
  * join (DSim-Join capability), dedup, and text analysis. Oracles are
  * brute-force DuckDB SQL — the operators must reach the same answers
  * without any cross join.
  *
  * Output columns avoid raw double division where a rounding-mode
  * difference between engines could flip a digit: set sizes (`inter`,
  * `uni`) are exact integers and Jaccard is derivable from them.
  */
object DocumentQueries {

  private def t(s: SparkSession, dir: String, name: String) = Tables(s, dir, name)

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Set-similarity self-join at τ=0.8 (SURVEY J12-J18): signature-pruned,
    // verified with exact Jaccard. The oracle is the O(n²) definition.
    "q18_simjoin_documents" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      SimilarityJoin.selfJoin(docs, "doc_id", "text", 0.8)
        .select(
          col("x_id"),
          col("y_id"),
          col("inter").cast("long").as("inter"),
          col("uni").cast("long").as("uni"))
        .orderBy("x_id", "y_id")
    }))

  val oracles: Map[String, String] = Map(
    "q18_simjoin_documents" ->
      """WITH tok AS (
        |  SELECT doc_id,
        |         list_distinct(list_filter(string_split(text, ' '), t -> t <> '')) AS toks
        |  FROM documents)
        |SELECT a.doc_id AS x_id, b.doc_id AS y_id,
        |       len(list_intersect(a.toks, b.toks)) AS inter,
        |       len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks)) AS uni
        |FROM tok a JOIN tok b ON a.doc_id < b.doc_id
        |WHERE len(list_intersect(a.toks, b.toks)) * 1.0 /
        |      (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks))) >= 0.8
        |ORDER BY 1, 2""".stripMargin)
}
