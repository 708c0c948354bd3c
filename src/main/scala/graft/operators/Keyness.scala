package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distinctive-term mining per group (keyness): which tokens are
  * over-represented in a source/language/domain relative to the rest of
  * the corpus — the domain-signature report curation teams read before
  * choosing mixture weights, and the feature-selection pass behind
  * hashed-gram domain classifiers (cf. [[TextClassifier]], DSIR's
  * domain-likelihood features).
  *
  * Score is integer LIFT in basis points — observed vs expected
  * occurrence under independence:
  *
  *   lift_bp(g, t) = ⌊10000 · c_gt · N / (n_g · total_t)⌋
  *
  * with c_gt = occurrences of t in g, n_g = tokens in g, total_t =
  * corpus-wide occurrences of t, N = corpus tokens. 10000 = exactly the
  * expected rate; a log transform (PMI/LLR) would order identically per
  * (g, t) magnitude but cost float portability, so the exact rational is
  * kept and divided ONCE (the k-means/PageRank fixed-point discipline).
  * Arithmetic runs in DECIMAL(38,0): 10⁴·c·N needs ~10²⁸ at trillion-token
  * corpora — past a long, inside decimal exactness.
  *
  * A `minCount` floor on c_gt is the standard keyness noise gate: a
  * hapax in a small group otherwise tops every list with a huge lift.
  *
  * Scale shape: ONE map-side-combinable (group, token) count shuffle
  * (vocab-sized output, corpus-sized input); group totals are a
  * #groups-row broadcast; token totals re-aggregate the (group, token)
  * relation (vocab-sized, not corpus-sized); final top-k rides the
  * two-phase [[TopK.perGroup]] so a mega-group never funnels into one
  * task. Nothing corpus-sized crosses a second shuffle.
  */
object Keyness {

  /** Top-k distinctive tokens per group.
    * Output: (group, tok, cnt, lift_bp, rk) — group keeps `groupCol`'s
    * name; rk is 1-based by (lift_bp desc, tok asc).
    */
  def distinctiveTerms(
      docs: DataFrame,
      groupCol: String,
      textCol: String,
      minCount: Long,
      k: Int): DataFrame = {
    require(minCount >= 1 && k >= 1, s"minCount/k must be >= 1: $minCount, $k")
    val dec = "decimal(38,0)"
    val tok = docs.select(
      col(groupCol).as("g"),
      explode(filter(split(col(textCol), " "), x => length(x) > 0)).as("tok"))
    val cgt = tok.groupBy("g", "tok").agg(count(lit(1)).as("cnt"))
    val perGroup = cgt.groupBy("g").agg(sum("cnt").as("n_g"))
    val perTok = cgt.groupBy("tok").agg(sum("cnt").as("total_t"))
    val n = perGroup.agg(sum("n_g").as("n_corpus"))
    val scored = cgt
      .filter(col("cnt") >= minCount)
      .join(broadcast(perGroup), "g")
      .join(perTok, "tok") // vocab-sized both sides, one hash join
      .crossJoin(broadcast(n))
      .withColumn("lift_bp",
        expr(s"""(10000 * cast(cnt as $dec) * cast(n_corpus as $dec))
                 div (cast(n_g as $dec) * cast(total_t as $dec))""").cast("long"))
    TopK
      .perGroup(
        scored.select(col("g").as(groupCol), col("tok"), col("cnt"), col("lift_bp")),
        Seq(groupCol),
        Seq(col("lift_bp").desc, col("tok").asc),
        k,
        rankCol = "rk")
  }
}
