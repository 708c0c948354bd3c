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
  * sound multi-round form instead:
  *   1. rows salt into `buckets` deterministic buckets; each bucket
  *      computes its LOCAL front via a bucket-keyed equi-self-join
  *      (candidate volume n²/buckets, partitioned);
  *   2. while the survivor set is still too large to broadcast AND a
  *      fresh-salt bucketed round keeps shrinking it, phase 1 repeats
  *      with a new salt (different bucket co-residents → new
  *      eliminations);
  *   3. the final exact pass: a broadcast anti-join when the survivors
  *      fit under `broadcastLimit` (typical — a d-dim front over n
  *      random points is O(log^{d−1} n)), else a block-partitioned
  *      nested-loop pass with NO broadcast anywhere — an adversarial
  *      anti-correlated corpus has a front of size n, and force-feeding
  *      n rows to every executor is exactly the OOM this guard removes
  *      (round-10 verdict).
  * Soundness: dominance never needs the dominator to be IN the front —
  * any r dominated by some r' is also dominated by a FRONT member
  * dominating-or-equal to r' (dominance is transitive and the front is
  * the set of maximal elements), and a maximal element survives every
  * bucketed round in ANY bucket; either way r meets a dominator again in
  * the final exact pass unless already eliminated — every truly
  * non-dominated row survives all phases (a front member is
  * non-dominated in any subset containing it), and every dominated row
  * is eliminated no later than the exact pass. Spec-pinned against the
  * brute-force front, including an anti-correlated front-of-size-n
  * fixture through the no-broadcast path.
  */
object Skyline {

  /** Survivor count above which the exact pass abandons the broadcast
    * anti-join for the block-partitioned one: 2²¹ vectors ≈ 50-130 MB
    * broadcast at 3-8 long dims — the comfortable ceiling. */
  val DefaultBroadcastLimit: Long = 1L << 21

  /** Fresh-salt bucketed rounds attempted before concluding the survivor
    * set has genuinely stopped shrinking. */
  val MaxSaltRounds = 3

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
    * That join broadcasts only under the same survivor-count guard as
    * the exact pass.
    */
  def paretoFront(
      df: DataFrame,
      idCol: String,
      dims: Seq[String],
      buckets: Int = 64,
      broadcastLimit: Long = DefaultBroadcastLimit): DataFrame = {
    require(dims.nonEmpty, "need at least one criterion dimension")
    require(buckets > 0, s"buckets must be positive: $buckets")
    val (winning, bounded) =
      frontVectorsBounded(
        df.select(dims.map(col): _*).distinct(), dims, buckets, broadcastLimit)
    // the front is usually tiny — but an adversarial front is corpus-sized,
    // so the re-attach join only broadcasts when the survivor count (a
    // bound on the front size, already measured) cleared the guard
    val attach = if (bounded) broadcast(winning) else winning
    df.select((idCol +: dims).map(col): _*)
      .join(attach, dims)
      .select((idCol +: dims).map(col): _*)
  }

  /** The guarded multi-round front over a DISTINCT criteria-vector
    * relation — shared by [[paretoFront]] and the streaming consumer
    * ([[graft.streaming.StreamingSkyline]], which carries the running
    * front through the online-skyline law front(A ∪ B) =
    * front(front(A) ∪ B): a dominated vector can never re-enter).
    *
    * Each bucketed round's survivor set is `localCheckpoint`ed (the
    * CacheManager cadence — blocks are reference-GC'd, unlike persist,
    * so per-batch streaming callers don't accumulate pinned cache
    * entries) and counted: the ONLY driver values are those bounded
    * counts. The broadcast exact pass is taken only under
    * `broadcastLimit`; otherwise [[blockNestedFront]].
    */
  private[graft] def frontVectors(
      vecs0: DataFrame, // dims columns only, distinct
      dims: Seq[String],
      buckets: Int,
      broadcastLimit: Long = DefaultBroadcastLimit): DataFrame =
    frontVectorsBounded(vecs0, dims, buckets, broadcastLimit)._1

  /** [[frontVectors]] plus whether the pre-exact-pass survivor count (an
    * upper bound on the front size) cleared `broadcastLimit` — so callers
    * can reuse the measurement for their own broadcast decisions instead
    * of re-counting. */
  private[graft] def frontVectorsBounded(
      vecs0: DataFrame,
      dims: Seq[String],
      buckets: Int,
      broadcastLimit: Long): (DataFrame, Boolean) = {

    def salted(rows: DataFrame, salt: Int): DataFrame =
      rows.withColumn(
        "__bk",
        pmod(xxhash64((lit(salt) +: dims.map(col)): _*), lit(buckets)))

    // anti-join away every vector with a dominator; bucketed rounds key
    // the self-join on the bucket (hash join + residual condition —
    // partitioned), the exact pass broadcasts the survivors (front-sized,
    // guarded by the caller)
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

    // LAZY checkpoint + explicit count = ONE materialization job (eager
    // localCheckpoint runs its own count internally, doubling the work)
    var cur = front(salted(vecs0, 0), Seq("__bk")).drop("__bk").localCheckpoint(false)
    var n = cur.count()
    var salt = 1
    var shrinking = true
    while (n > broadcastLimit && shrinking && salt <= MaxSaltRounds) {
      val next = front(salted(cur, salt), Seq("__bk")).drop("__bk").localCheckpoint(false)
      val m = next.count()
      shrinking = m < n
      if (shrinking) { cur = next; n = m }
      salt += 1
    }
    if (n <= broadcastLimit) (front(cur, Seq.empty), true)
    else (blockNestedFront(cur, dims, buckets), false)
  }

  /** Exact dominance elimination with NO broadcast: every survivor
    * replicates across `blocks` block ids, the dominator set partitions
    * into those blocks by vector hash, and a per-block semi-join marks
    * dominated vectors — n²/blocks comparisons per block, all
    * partitioned; a final all-dims equi anti-join (hash-partitioned)
    * removes the marked set. This is the honest fallback for genuinely
    * corpus-sized fronts: quadratic like any exact skyline on an
    * anti-correlated corpus, but memory-bounded per task at any n.
    */
  private def blockNestedFront(
      vecs: DataFrame,
      dims: Seq[String],
      blocks: Int): DataFrame = {
    val l = vecs
      .select(dims.map(c => col(c).as(s"__l_$c")): _*)
      .withColumn(
        "__lblk",
        pmod(xxhash64(dims.map(c => col(s"__l_$c")): _*), lit(blocks)).cast("int"))
    val replicated =
      vecs.withColumn("__blk", explode(sequence(lit(0), lit(blocks - 1))))
    val dominated = replicated
      .join(
        l,
        col("__blk") === col("__lblk") &&
          dominates(dims.map(c => col(s"__l_$c")), dims.map(col)),
        "left_semi")
      .select(dims.map(col): _*)
      .distinct()
    vecs.join(dominated, dims, "left_anti")
  }
}
