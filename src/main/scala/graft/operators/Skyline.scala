package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed skyline (Pareto front) over integer criteria — the
  * multi-objective selection a curation pipeline runs when no single
  * score orders documents: "keep every document no other document beats
  * on ALL of (length, lexical diversity, novelty, …)" (Börzsönyi et al.
  * 2001's skyline operator, restated for Spark).
  *
  * All dimensions MAXIMIZE (callers negate minimizing criteria). Row r
  * is dominated by r' iff r' ≥ r on every dim and > on at least one;
  * ties on all dims dominate in neither direction, so duplicated
  * criteria vectors all surface (set semantics belong to the caller).
  *
  * Scale shape — the naive NOT EXISTS is an n² θ-join; this is the
  * sound two-phase form instead:
  *   1. rows salt into `buckets` deterministic buckets; each bucket
  *      computes its LOCAL front via a bucket-keyed equi-self-join
  *      (candidate volume n²/buckets, partitioned);
  *   2. the survivors (typically ≪ n: a d-dim front over n random
  *      points is O(log^{d−1} n)) run one exact survivors² pass.
  * Soundness: dominance never needs the dominator to be IN the front —
  * but any r dominated by some r' is also dominated by a FRONT member
  * dominating-or-equal to r' (dominance is transitive and the front is
  * the set of maximal elements), and r' itself survives phase 1 only if
  * nothing in ITS bucket dominates it; either way r meets a dominator
  * again in phase 2 unless r was already eliminated — every truly
  * non-dominated row survives both phases (a global front member is
  * non-dominated in any subset containing it), and every dominated row
  * is eliminated no later than phase 2 because phase 2 still contains a
  * row dominating it: the chain r ≺ r' ≺ … terminates at a maximal
  * element, which survives phase 1 in ANY bucket. Spec-pinned against
  * the brute-force front.
  */
object Skyline {

  private def dominates(l: Seq[Column], r: Seq[Column]): Column = {
    val geAll = l.zip(r).map { case (a, b) => a >= b }.reduce(_ && _)
    val gtAny = l.zip(r).map { case (a, b) => a > b }.reduce(_ || _)
    geAll && gtAny
  }

  /** The Pareto front: input rows (idCol + dims) minus every dominated
    * row. Output: (idCol, dims…).
    *
    * The phases run over DISTINCT criteria vectors, not rows: exact ties
    * dominate in neither direction, so a criteria vector's front
    * membership is row-multiplicity-free — deduping first keeps the
    * quadratic phases tie-proof (a corpus where a popular criteria
    * vector repeats millions of times costs the front computation
    * nothing extra; the 10× replica A/B went 34× slower before this),
    * and the winning vectors re-attach their rows by one equi-join.
    */
  def paretoFront(
      df: DataFrame,
      idCol: String,
      dims: Seq[String],
      buckets: Int = 64): DataFrame = {
    require(dims.nonEmpty, "need at least one criterion dimension")
    require(buckets > 0, s"buckets must be positive: $buckets")
    val winning = frontVectors(df.select(dims.map(col): _*).distinct(), dims, buckets)
    df.select((idCol +: dims).map(col): _*)
      .join(broadcast(winning), dims)
      .select((idCol +: dims).map(col): _*)
  }

  /** The two-phase front over a DISTINCT criteria-vector relation —
    * shared by [[paretoFront]] and the streaming consumer
    * ([[graft.streaming.StreamingSkyline]], which carries the running
    * front through the online-skyline law front(A ∪ B) =
    * front(front(A) ∪ B): a dominated vector can never re-enter).
    */
  private[graft] def frontVectors(
      vecs0: DataFrame, // dims columns only, distinct
      dims: Seq[String],
      buckets: Int): DataFrame = {
    val vecs = vecs0
      .withColumn("__bk", pmod(xxhash64(dims.map(col): _*), lit(buckets)))

    // anti-join away every vector with a dominator; phase 1 keys the
    // self-join on the bucket (hash join + residual condition —
    // partitioned), phase 2 broadcasts the survivors (front-sized)
    def front(rows: DataFrame, key: Seq[String]): DataFrame = {
      val l0 = rows.columns.foldLeft(rows)((d, c) => d.withColumnRenamed(c, s"__l_$c"))
      val l = if (key.isEmpty) broadcast(l0) else l0
      val cond = key.map(c => col(s"__l_$c") === col(c)).reduceOption(_ && _)
        .getOrElse(lit(true))
      rows.join(
        l,
        cond && dominates(dims.map(c => col(s"__l_$c")), dims.map(col)),
        "left_anti")
    }

    front(front(vecs, Seq("__bk")).drop("__bk"), Seq.empty)
  }
}
