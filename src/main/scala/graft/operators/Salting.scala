package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Explicit skew-salting for hot join keys (SURVEY D4 — the reference's
  * frequency-weighted `SimilarityQueryPartitioner`,
  * `DSim-Join/src/main/scala/ds_join/SimilarityQueryPartitioner.scala.scala:31-56`,
  * re-expressed declaratively). AQE's skew-join handles most cases at
  * runtime; explicit salting is for the pathological key whose single hash
  * partition exceeds what one task should own regardless of AQE splits —
  * e.g. a signature shared by half the corpus.
  *
  * Shape: the SKEWED side gets a random-but-deterministic salt in
  * [0, salts); the other side is replicated `salts` times; the join key
  * becomes (key, salt). Same join result, `salts`-way parallel hot keys.
  */
object Salting {

  /** Engine-level arming of the salted-shuffle regimes (round-14 verdict
    * task 3: the knobs existed but every production entry point left them
    * at 0, so a celebrity key funneled through one task unless the CALLER
    * knew a default-off parameter). The streaming operators now resolve
    * their salt knobs through these session confs, so one deployment-level
    * setting arms the defense for every query in the session:
    *
    *   - `spark.graft.salt.threshold` — [[graft.streaming.StreamingDedup]]
    *     per-batch probe: batch keys with count > threshold salt;
    *   - `spark.graft.salt.hotAbove` —
    *     [[graft.streaming.SemiStreamSimilarityJoin]]: index keys with
    *     list length > this salt the cache-hit/fetched-miss joins.
    *
    * Both default OFF (unset/0) — plans are unchanged unless armed, and an
    * explicit per-call argument always wins over the session conf.
    */
  val ThresholdKey = "spark.graft.salt.threshold"
  val HotAboveKey = "spark.graft.salt.hotAbove"

  /** Resolve a salt knob: explicit positive wins; the 0 default defers to
    * the session conf (unset/non-positive = off); explicit negative forces
    * off regardless of conf.
    */
  def armed(spark: org.apache.spark.sql.SparkSession, key: String, explicit: Long): Long =
    if (explicit > 0L) explicit
    else if (explicit < 0L) 0L
    else spark.conf.getOption(key).map(_.trim.toLong).filter(_ > 0L).getOrElse(0L)

  /** Salt the skewed (probe) side: adds `__salt` from a deterministic hash
    * of the whole row (not the key — the point is to SPREAD identical
    * keys).
    */
  def saltProbe(df: DataFrame, salts: Int): DataFrame =
    df.withColumn("__salt", pmod(xxhash64(df.columns.map(col): _*), lit(salts)).cast("int"))

  /** Replicate the build side across all salt values. */
  def replicateBuild(df: DataFrame, salts: Int): DataFrame =
    df.withColumn("__salt", explode(sequence(lit(0), lit(salts - 1))))

  /** Salted inner equi-join on `key`: equivalent to
    * `probe.join(build, key)` with hot keys spread over `salts` tasks.
    */
  def saltedJoin(probe: DataFrame, build: DataFrame, key: String, salts: Int): DataFrame =
    saltProbe(probe, salts)
      .join(replicateBuild(build, salts), Seq(key, "__salt"))
      .drop("__salt")

  /** PER-KEY salt factors from an observed key histogram — the dynamic
    * micro-batch partitioning idea (cf. PROMPT, SIGMOD 2020): a
    * micro-batch runtime computes this on batch N's keys and applies it
    * to batch N+1, so only keys MEASURED hot pay any replication at all
    * (the blanket [[saltedJoin]] replicates the whole build side).
    *
    * factor(k) = min(maxSalts, ⌈count(k)/threshold⌉) for the top-N keys
    * with count > threshold; everything else is absent (= factor 1).
    * Output (key-named column, `__factor`) is a ≤ topN-row relation —
    * broadcastable by construction, never a driver-side map.
    */
  def hotKeyFactors(
      df: DataFrame,
      key: String,
      threshold: Long,
      maxSalts: Int,
      topN: Int = 1024): DataFrame =
    hotKeyFactors(df, Seq(key), threshold, maxSalts, topN)

  /** Multi-column-key form — composite join keys (e.g. a band join's
    * (band, bsig)) measure and salt exactly like single keys.
    */
  def hotKeyFactors(
      df: DataFrame,
      keys: Seq[String],
      threshold: Long,
      maxSalts: Int,
      topN: Int): DataFrame = {
    require(keys.nonEmpty && threshold >= 1 && maxSalts >= 1 && topN >= 1)
    TopK.perGroup(
        df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("__cnt"))
          .filter(col("__cnt") > threshold),
        Seq.empty,
        col("__cnt").desc +: keys.map(col(_).asc),
        topN,
        rankCol = "__rk")
      .select(
        keys.map(col) :+
          least(
            lit(maxSalts.toLong),
            expr(s"(__cnt + ${threshold - 1}) div $threshold")).cast("int").as("__factor"): _*)
  }

  /** Adaptive salted inner equi-join: bag-equal to `probe.join(build,
    * key)`, but each key listed in `factors` spreads over its own factor
    * of sub-partitions and ONLY those keys' build rows replicate (cold
    * keys join exactly as before — zero overhead where there is no
    * skew). `factors` rides as a broadcast on both sides.
    */
  def adaptiveSaltedJoin(
      probe: DataFrame,
      build: DataFrame,
      key: String,
      factors: DataFrame): DataFrame =
    adaptiveSaltedJoin(probe, build, Seq(key), factors)

  /** Multi-column-key form of [[adaptiveSaltedJoin]]. */
  def adaptiveSaltedJoin(
      probe: DataFrame,
      build: DataFrame,
      keys: Seq[String],
      factors: DataFrame): DataFrame = {
    val f = broadcast(factors.select(keys.map(col) :+ col("__factor"): _*))
    val p = probe
      .join(f, keys, "left")
      .withColumn(
        "__salt",
        pmod(xxhash64(probe.columns.map(col): _*), coalesce(col("__factor"), lit(1)))
          .cast("int"))
      .drop("__factor")
    val b = build
      .join(f, keys, "left")
      .withColumn(
        "__salt",
        explode(sequence(lit(0), coalesce(col("__factor"), lit(1)) - 1)))
      .withColumn("__salt", col("__salt").cast("int"))
      .drop("__factor")
    // SHUFFLE_HASH on the replicated (small) side: the default sort-merge
    // join SORTS the probe side and buffers each key group — on the hot
    // many-many keys this regime exists for, that re-concentrates the
    // per-key product into the merge loop. A per-partition hash build of
    // the replicated side streams the probe side through unsorted
    // (guide §3.1); AQE is unavailable under the streaming harness, so
    // the strategy must be pinned here. Measured on q244's batch-3 state
    // probe: 16.5-31.7 s (SMJ) → see OPTIMIZATION_r15.md.
    p.join(b.hint("shuffle_hash"), keys :+ "__salt").drop("__salt")
  }
}
