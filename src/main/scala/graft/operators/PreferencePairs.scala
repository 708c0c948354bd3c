package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Preference-pair construction for reward-model / DPO training data:
  * from a relation of scored candidates (several responses per prompt,
  * several paraphrases per cluster, several crawls per URL), emit one
  * (chosen, rejected) pair per group — the best-scored vs worst-scored
  * candidate — keeping only groups whose score margin clears a floor
  * (near-tie pairs teach a preference model nothing and drown the
  * gradient in label noise).
  *
  * Deterministic by construction: ties on score break toward the smaller
  * id on BOTH ends, so reruns and engine ports pick identical pairs.
  * Groups reduced to a single candidate, or whose best and worst collapse
  * onto the same candidate (all-tied group at minMargin = 0), are
  * dropped — a pair needs two distinct members.
  *
  * Scale shape: ONE map-side-combinable aggregate — argmax and argmin
  * travel as min(struct) partial aggregates, so a group's candidates
  * never assemble in one task and a celebrity prompt with millions of
  * candidates costs its combiner nothing. No windows, no self-join.
  */
object PreferencePairs {

  /** Output: (g, n_candidates, chosen_id, chosen_score, rejected_id,
    * rejected_score, margin) — margin = chosen_score − rejected_score,
    * kept when ≥ minMargin and the two ids differ.
    */
  def pairs(
      df: DataFrame,
      groupCol: String,
      idCol: String,
      scoreCol: String,
      minMargin: Long): DataFrame = {
    require(minMargin >= 0, s"minMargin must be >= 0: $minMargin")
    df
      .select(
        col(groupCol).as("g"),
        col(idCol).as("id"),
        col(scoreCol).cast("long").as("score"))
      .groupBy("g")
      .agg(
        count(lit(1)).as("n_candidates"),
        // min(struct(−score, id)): max score, ties to the smaller id
        min(struct((-col("score")).as("ns"), col("id"))).as("__best"),
        // min(struct(score, id)): min score, ties to the smaller id
        min(struct(col("score"), col("id"))).as("__worst"))
      .select(
        col("g"),
        col("n_candidates"),
        col("__best.id").as("chosen_id"),
        (-col("__best.ns")).as("chosen_score"),
        col("__worst.id").as("rejected_id"),
        col("__worst.score").as("rejected_score"),
        (-col("__best.ns") - col("__worst.score")).as("margin"))
      .filter(
        col("chosen_id") =!= col("rejected_id") && col("margin") >= minMargin)
  }
}
