package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** AMS / tug-of-war sketch (Alon–Matias–Szegedy 1996) for the second
  * frequency moment F₂ = Σ_keys f_k² — equivalently a self-join size, the
  * quantity a join planner wants before committing to a strategy and a
  * skew red-flag (F₂ ≫ n means heavy keys). The exact computation needs
  * a key-grain shuffle ([[Profiling]]'s distinct/count path); the sketch
  * is s counters of Σ sign_r(key) — map-side-combinable, fixed-size,
  * and LINEAR: sketches of two relations add counter-wise, so increments
  * fold into state and estimates never re-touch raw data. E[C_r²] = F₂.
  *
  * Signs are deterministic hashes (hex character r of md5(key), high-bit
  * parity — the same md5 discipline as [[QuantileSketch]]), so the
  * sketch and its estimate are bit-reproducible and SQL-replayable; the
  * estimator's variance guarantee assumes 4-wise independence which md5
  * approximates far beyond the textbook requirement. Estimate:
  * ⌊Σ C_r² / s⌋ exact integer.
  *
  * Scale shape: ONE aggregate over the input computing all s counter
  * sums as columns (whole-stage codegen, no explode — the row never
  * leaves its partition until the s-value partial aggregate), melted to
  * (r, counter) rows; estimate and merge touch only s-row relations.
  */
object AmsSketch {

  /** Build: (r, counter) for r in [0, s). One md5 per row — counter r
    * reads hex character r+1 of the digest (32 available, s ≤ 32), so
    * the hash cost does not scale with s.
    */
  def build(df: DataFrame, keyCol: String, s: Int): DataFrame = {
    require(s >= 1 && s <= 32, s"counter count s must be in [1, 32]: $s")
    def signSum(r: Int) =
      expr(s"coalesce(sum(IF(substring(__h, ${r + 1}, 1) " +
        "IN ('0','1','2','3','4','5','6','7'), 1, -1)), 0)").as(s"__c_$r")
    val sums = df
      .select(md5(col(keyCol).cast("string")).as("__h"))
      .agg(signSum(0), (1 until s).map(signSum): _*)
    sums.select(explode(array((0 until s).map(r =>
        struct(lit(r).as("r"), col(s"__c_$r").as("counter"))): _*)).as("rc"))
      .select(
        col("rc.r").cast("int").as("r"),
        col("rc.counter").cast("long").as("counter"))
  }

  /** Merge sketches of disjoint (or signed-delta) inputs: counters add. */
  def merge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy("r").agg(sum("counter").as("counter"))

  /** F₂ estimate from a sketch: one row (s, f2_est) = ⌊Σ C_r²/s⌋. */
  def f2Estimate(sketch: DataFrame): DataFrame =
    sketch.agg(
        count(lit(1)).as("s"),
        sum(col("counter") * col("counter")).as("__ss"))
      .select(col("s"), expr("__ss div s").as("f2_est"))

  /** EQUI-JOIN SIZE estimate from two sketches over the same key domain:
    * |A ⋈ B| = Σ_k fA(k)·fB(k) and E[C_r(A)·C_r(B)] equals exactly that
    * inner product (the AGMS join-size estimator, Alon–Gibbons–Matias–
    * Szegedy 1999) — the number a planner wants BEFORE choosing
    * broadcast vs shuffle vs skew-salt, from two s-row relations and no
    * key-grain shuffle. Estimate: ⌊Σ_r C_r(A)·C_r(B) / s⌋, exact integer
    * given the counters; can be negative on tiny inputs (an unbiased
    * estimator's tail), which itself signals "too small to matter".
    * Sketches must share `s` (same r domain — enforced by the join).
    */
  def joinSizeEstimate(a: DataFrame, b: DataFrame): DataFrame =
    a.select(col("r"), col("counter").as("ca"))
      .join(b.select(col("r"), col("counter").as("cb")), "r")
      .agg(count(lit(1)).as("s"), sum(col("ca") * col("cb")).as("__ip"))
      .select(col("s"), expr("__ip div s").as("join_size_est"))
}
