package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data-profiling tier: schema-level facts a pipeline discovers ABOUT a
  * table before trusting it — here functional dependencies (does column
  * `a` determine column `b`?), the audit behind key discovery, join-safety
  * checks ("is this dimension key actually unique per attribute?"), and
  * denormalization validation on ingested data whose contracts are
  * undocumented.
  */
object Profiling {

  /** Functional-dependency audit over every ordered pair of `cols`:
    * a → b holds iff each distinct value of `a` co-occurs with exactly
    * one value of `b`, i.e. |distinct(a, b)| = |distinct(a)|.
    * `violations = n_pairs − n_lhs` counts the extra (a, b) combinations
    * beyond one-per-lhs — 0 exactly when the FD holds, and the size of
    * the repair set when it does not.
    *
    * Scale shape: ONE table scan exploding each row to its p·(p−1) pair
    * projections (p is the profiled column count — single digits in
    * practice, a constant fan-out), one `distinct` exchange on
    * (pair, va, vb) whose map-side combine collapses to the distinct-pair
    * volume, then a pair-sized aggregation. No per-pair scans, no
    * Expand-multiplied multi-count_distinct aggregate (p² distinct
    * aggregates in one groupBy would multiply the scan p²-fold).
    *
    * Values compare under an injective string cast (profiling identity,
    * not typed semantics); rows where either side of a pair is NULL are
    * excluded from THAT pair's audit (count_distinct semantics in any
    * engine) — documented, not hidden.
    * Output: (a, b, n_lhs, n_pairs, holds, violations).
    */
  def functionalDependencies(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2, s"need at least two columns, got $cols")
    require(cols.distinct.size == cols.size, s"duplicate columns: $cols")
    val pairs = for { a <- cols; b <- cols if a != b } yield (a, b)
    val pairStructs = array(pairs.map { case (a, b) =>
      struct(
        lit(a).as("a"),
        lit(b).as("b"),
        col(a).cast("string").as("va"),
        col(b).cast("string").as("vb"))
    }: _*)
    df.select(explode(pairStructs).as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"), col("p.va").as("va"), col("p.vb").as("vb"))
      .filter(col("va").isNotNull && col("vb").isNotNull)
      .distinct()
      .groupBy("a", "b")
      .agg(
        count_distinct(col("va")).as("n_lhs"),
        count(lit(1)).as("n_pairs"))
      .withColumn("holds", col("n_pairs") === col("n_lhs"))
      .withColumn("violations", col("n_pairs") - col("n_lhs"))
  }
}
