package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic mergeable quantile summary: the bottom-k-by-hash value
  * sample (Cohen 2007 bottom-k sketches; the coordinated-sampling lineage
  * of Duffield–Lund–Thorup). Each group keeps the k rows whose md5(id)
  * sorts smallest, carrying their values; quantiles of the group are then
  * estimated from the sample's order statistics.
  *
  * Why this over KLL/GK/t-digest: their compaction trees depend on
  * arrival order, so two runs (or two engines) produce different sketches
  * from the same data — unacceptable in a repo whose contract is
  * bit-reproducible, SQL-oracle-able results. The bottom-k sample is a
  * pure function of the SET: min-k(A ∪ B) = min-k(min-k(A) ∪ min-k(B)),
  * so partial sketches merge associatively (partition-parallel build,
  * cross-snapshot folds, streaming accumulation) and every estimate
  * replays exactly. md5 is uniform enough that the sample is a uniform
  * random sample seeded by the ID — ingest-stable, no Math.random.
  *
  * Accuracy is the uniform-sample bound (±O(1/√k) rank error, e.g.
  * k = 4096 → ~1.5 rank points) — looser than KLL's per-quantile
  * guarantee but mergeable AND deterministic; when exactness matters the
  * repo's exact histogram path ([[Quantiles]]) is the answer, at the cost
  * of a value-grain shuffle. The sketch's win is bounded state: k rows
  * per group forever, however large the group.
  *
  * Scale shape: build is [[TopK.perGroup]] (two-phase, hash-sharded — no
  * group ever funnels through one task); merge and estimate touch only
  * k-bounded relations.
  */
object QuantileSketch {

  /** Build the sketch: the k rows per group with smallest (md5(id), id).
    * Output: (groupCols…, hkey, id, value) — `k` rows per group at most.
    */
  def build(
      df: DataFrame,
      groupCols: Seq[String],
      idCol: String,
      valueCol: String,
      k: Int): DataFrame = {
    require(k >= 1, s"sketch size k must be >= 1: $k")
    val base = df.select(
      groupCols.map(col) ++ Seq(
        md5(col(idCol).cast("string")).as("hkey"),
        col(idCol).cast("string").as("id"),
        col(valueCol).cast("long").as("value")): _*)
    TopK.perGroup(base, groupCols, Seq(col("hkey").asc, col("id").asc), k)
      .drop("rk")
  }

  /** Merge sketches built over DISJOINT row sets: union, re-select the
    * bottom k — associative and order-free by the min-k identity.
    */
  def merge(a: DataFrame, b: DataFrame, groupCols: Seq[String], k: Int): DataFrame =
    TopK.perGroup(
      a.unionByName(b), groupCols, Seq(col("hkey").asc, col("id").asc), k)
      .drop("rk")

  /** Quantile estimates from a sketch: for each q = num/den (0 < q ≤ 1),
    * the percentile_disc convention over the SAMPLE — the value at rank
    * ⌈q·n⌉ of the value-sorted sample (ties to the smaller id). Output:
    * (groupCols…, q_num, q_den, n_sample, est). Windows here see ≤ k rows
    * per group by construction.
    */
  def quantiles(
      sketch: DataFrame,
      groupCols: Seq[String],
      qs: Seq[(Long, Long)]): DataFrame = {
    require(qs.nonEmpty && qs.forall { case (n, d) => n >= 1 && n <= d },
      s"quantiles must satisfy 0 < num/den <= 1: $qs")
    val spark = sketch.sparkSession
    import spark.implicits._
    val qdf = qs.toDF("q_num", "q_den")
    val vrkW = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(col("value").asc, col("id").asc)
    val nW = Window.partitionBy(groupCols.map(col): _*)
    sketch
      .withColumn("vrk", row_number().over(vrkW))
      .withColumn("n_sample", count(lit(1)).over(nW))
      .crossJoin(broadcast(qdf))
      // ⌈q·n⌉ = (n·num + den − 1) div den, clamped to ≥ 1
      .filter(col("vrk") === greatest(
        lit(1L), expr("(n_sample * q_num + q_den - 1) div q_den")))
      .select(
        groupCols.map(col) ++ Seq(
          col("q_num"), col("q_den"), col("n_sample"),
          col("value").as("est")): _*)
  }
}
