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

  /** Exact-phrase occurrence counting, SCAN path: for a known m-token
    * phrase, one pass over the token array per document — every start
    * position whose m-slice equals the phrase counts (OVERLAPPING
    * occurrences included: "a a a" contains "a a" twice — the convention
    * positional indexes use). No shuffle, no explode; whole-stage
    * codegen over array HOFs. Output: (id, n_occ, first_pos) for
    * documents with ≥ 1 occurrence (positions 1-based).
    */
  def phraseCount(
      df: DataFrame,
      idCol: String,
      textCol: String,
      phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "phrase must be non-empty")
    require(phrase.forall(t => !t.contains("'")), s"unquotable phrase token: $phrase")
    val m = phrase.size
    val phraseSql = phrase.map(t => s"'$t'").mkString("array(", ", ", ")")
    df.select(
        col(idCol),
        filter(split(col(textCol), " "), t => length(t) > 0).as("__t"))
      .select(
        col(idCol),
        expr(
          s"""IF(size(__t) < $m, array(),
             |   filter(sequence(1, size(__t) - $m + 1),
             |          i -> slice(__t, i, $m) == $phraseSql))""".stripMargin)
          .as("__pos"))
      .select(
        col(idCol),
        size(col("__pos")).cast("long").as("n_occ"),
        expr("try_element_at(__pos, 1)").cast("long").as("first_pos"))
      .filter(col("n_occ") >= 1L)
  }

  /** Positional postings index: (token, id, pos), pos 1-based — the
    * classic inverted index with positions. Materialize to parquet
    * SORTED BY token (the q35 sig-index discipline): a phrase query then
    * reads only the row groups whose min/max token range covers its
    * terms (pushed filters), never the whole index.
    */
  def buildPostings(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
        col(idCol).as("id"),
        posexplode(filter(split(col(textCol), " "), t => length(t) > 0)))
      .select(col("col").as("token"), col("id"), (col("pos") + 1).cast("long").as("pos"))

  /** Exact-phrase counting, INDEX path: m-way self-join of the postings
    * relation with position arithmetic (term k at pos + k). Cost scales
    * with the SELECTIVITY of the phrase terms (Σ posting-list lengths),
    * not the corpus: rare phrases over a token-sorted parquet index read
    * a few row groups where the scan path reads every document. Returns
    * the same (id, n_occ, first_pos) as [[phraseCount]] — the spec pins
    * path equality.
    */
  def phraseCountIndexed(postings: DataFrame, phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "phrase must be non-empty")
    val first = postings.filter(col("token") === phrase.head)
      .select(col("id"), col("pos"))
    val matched = phrase.zipWithIndex.tail.foldLeft(first) { case (acc, (t, k)) =>
      acc.join(
        postings.filter(col("token") === t)
          .select(col("id"), (col("pos") - k).as("pos")),
        Seq("id", "pos"))
    }
    matched.groupBy("id")
      .agg(count(lit(1)).as("n_occ"), min("pos").as("first_pos"))
  }

  /** Dictionary phrase matching (gazetteer tagging): every phrase of a
    * dictionary RELATION matched against every document — entity/PII-term
    * tagging at corpus scale, where [[phraseCount]]'s literal-phrase form
    * stops scaling (one scan per phrase) and a trie (Aho–Corasick) cannot
    * be expressed relationally.
    *
    * Plan: tokenize the corpus once into positional postings; for each
    * phrase pick its RAREST token (min occurrence count, deterministic
    * (count, offset, token) tie-break) as the anchor — "the San Jose"
    * anchors on "Jose", not "the"; broadcast the anchor table onto the
    * postings (no shuffle — dictionary-grain); candidates then verify by
    * one id-grain join back to the token arrays with an exact slice
    * compare. Cost: one corpus tokenize pass + a candidate volume of
    * Σ_phrases occurrences(rarest token) — selectivity-bound, the same
    * contract as [[phraseCountIndexed]], but for the whole dictionary in
    * one pass. Phrases containing a token absent from the corpus simply
    * match nothing.
    *
    * Output: (id, phrase_id, n_occ, first_pos) for docs with ≥ 1
    * occurrence (overlapping counted, positions 1-based).
    */
  def dictionaryMatch(
      df: DataFrame,
      idCol: String,
      textCol: String,
      dict: DataFrame,
      phraseIdCol: String,
      phraseCol: String): DataFrame = {
    val toks = df.select(
      col(idCol).as("id"),
      filter(split(col(textCol), " "), t => length(t) > 0).as("__t"))
    val postings = toks.select(
      col("id"), posexplode(col("__t")))
      .select(col("col").as("token"), col("id"), (col("pos") + 1).cast("long").as("pos"))
    val tokenCnt = postings.groupBy("token").agg(count(lit(1)).as("__cnt"))
    val ptoks = dict.select(
      col(phraseIdCol).as("phrase_id"),
      filter(split(col(phraseCol), " "), t => length(t) > 0).as("__p"))
      .filter(size(col("__p")) > 0)
    val anchors = ptoks
      .select(col("phrase_id"), col("__p"), posexplode(col("__p")))
      .select(col("phrase_id"), col("__p"), col("pos").as("__k"), col("col").as("token"))
      .join(tokenCnt, Seq("token"))
      .groupBy("phrase_id", "__p")
      .agg(min(struct(col("__cnt"), col("__k"), col("token"))).as("__a"))
      .select(
        col("phrase_id"), col("__p"),
        col("__a.__k").as("__k"), col("__a.token").as("token"))
    val candidates = postings
      .join(broadcast(anchors), Seq("token"))
      .select(
        col("id"), col("phrase_id"), col("__p"),
        (col("pos") - col("__k")).as("start"))
      .filter(col("start") >= 1L)
    candidates
      .join(toks, Seq("id"))
      .filter(expr("slice(__t, start, size(__p)) == __p"))
      .groupBy("id", "phrase_id")
      .agg(count(lit(1)).as("n_occ"), min("start").as("first_pos"))
  }

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
