package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Keyword retrieval over a document corpus — the targeted-selection step
  * of a training-data pipeline (pull the docs most relevant to a seed term
  * set, DSIR/importance-sampling style) and the classic inverted-index
  * query, re-expressed scan-first for Spark.
  *
  * Scoring is a BM25-shaped relevance kept EXACT-INTEGER for engine
  * portability: score(d) = Σ_t tf(d,t) · (N − df(t)). The linear
  * (N − df) surrogate preserves BM25's structure — monotone in term
  * frequency, discounting common terms — while avoiding `log`/double sums
  * whose last-ulp association order differs across engines (the q25
  * lesson); every score is a bigint a SQL oracle reproduces bit-for-bit.
  *
  * Scale shape (the part that matters at 100 TB): the term list is tiny
  * and known, so there is NO explode and NO per-token shuffle —
  * stage 1 computes per-document tf for each term inside whole-stage
  * codegen (the token array is a single staged alias, evaluated once per
  * row); stage 2 aggregates (N, df_t) into ONE summary row broadcast back
  * via cross-join; stage 3 scores and takes the global top-k through
  * TakeOrderedAndProject (per-partition heads, never a full sort). The tf
  * relation feeds both stage 2 and stage 3, and Spark would otherwise
  * recompute it — scanning the TEXT twice — so it is materialized via an
  * eager localCheckpoint: tf is id + k longs (orders of magnitude smaller
  * than the text it summarizes), making the expensive scan single-pass.
  * localCheckpoint rather than persist(): CacheManager pins persisted
  * plans for the session lifetime, so a service calling topK repeatedly
  * would accrete cache entries, while checkpoint blocks are reclaimed by
  * ContextCleaner once the result is unreachable. The trades (documented
  * because they are real): no lineage, so an executor loss mid-query
  * fails the query instead of recomputing; and the RDD path hides the
  * scan from AQE — harmless here, the downstream is a broadcast
  * cross-join + TakeOrderedAndProject with no shuffle to re-plan.
  * Total cost: one corpus text scan + one count-style agg.
  *
  * Reference anchor: the word-frequency / targeted-fetch shape of the
  * reference's stored-relation scans (DS-Join/DS_join_step4/src/main/scala
  * /streaming.scala keyed fetches), generalized to ranked retrieval.
  *
  * Output: (id, n_hit, score) for the k best docs with score > 0,
  * ordered (score desc, id asc) with the id tiebreak making top-k
  * set-deterministic.
  */
object KeywordSearch {

  def topK(
      df: DataFrame,
      idCol: String,
      textCol: String,
      terms: Seq[String],
      k: Int): DataFrame = {
    require(terms.nonEmpty, "at least one term")
    require(terms.distinct.size == terms.size, s"duplicate terms: $terms")
    val toks = filter(split(col(textCol), " "), t => length(t) > 0)
    // stage 1: token array once per row, then per-term tf referencing it —
    // staged aliases keep the split from re-evaluating per term
    val tf = df
      .select(col(idCol), toks.as("_toks"))
      .select(
        (col(idCol) +: terms.zipWithIndex.map { case (t, i) =>
          size(filter(col("_toks"), x => x === lit(t))).cast("long").as(s"_tf_$i")
        }): _*)
      .localCheckpoint(true) // text-free (id + k longs); stats agg + scoring both read it
    // stage 2: one summary row (N, df per term)
    val stats = tf.agg(
      count(lit(1)).as("_n"),
      terms.indices.map(i =>
        sum(when(col(s"_tf_$i") > 0, 1L).otherwise(0L)).as(s"_df_$i")): _*)
    // stage 3: score, positive hits only, global top-k (TakeOrderedAndProject)
    val score = terms.indices
      .map(i => col(s"_tf_$i") * (col("_n") - col(s"_df_$i")))
      .reduce(_ + _)
    val nHit = terms.indices
      .map(i => when(col(s"_tf_$i") > 0, 1L).otherwise(0L))
      .reduce(_ + _)
    tf.crossJoin(broadcast(stats))
      .select(col(idCol), nHit.as("n_hit"), score.as("score"))
      .filter(col("score") > 0)
      .orderBy(col("score").desc, col(idCol).asc)
      .limit(k)
  }
}
