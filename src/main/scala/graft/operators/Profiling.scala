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

  /** Inclusion-dependency (foreign-key) discovery ACROSS relations: for
    * every ordered pair of profiled columns, does values(a) ⊆ values(b)?
    * The FK audit next to [[functionalDependencies]]' key audit — which
    * join directions are safe, which "foreign keys" silently dangle.
    *
    * SPIDER/BINDER-style single pass (Bauckmann 2006 / Papenbrock 2015):
    * one (column, value) relation (each source scanned once, values
    * distinct per column), grouped BY VALUE into the set of columns
    * containing it; the pair a ⊆ b is violated by exactly the value
    * groups containing `a` but not `b`, so every pair's violation count
    * falls out of ONE value-grouped pass — p² EXCEPT-joins never run.
    * The value exchange carries each distinct (column, value) once;
    * group fan-out is |S_v|·p with p the profiled column count.
    *
    * Values compare under the injective string cast (integer/string keys
    * — the FK case; floats don't render identically across engines and
    * are poor join keys anyway); NULLs are excluded (SQL FK semantics).
    * Output: (a, b, n_lhs_values, n_missing, holds) — `n_missing` is the
    * count of a's distinct values absent from b (the dangling-key count).
    */
  def inclusionDependencies(sources: Seq[(String, DataFrame, String)]): DataFrame = {
    require(sources.size >= 2, "need at least two (label, df, column) sources")
    val labels = sources.map(_._1)
    require(labels.distinct.size == labels.size, s"duplicate labels: $labels")
    val values = sources.map { case (label, df, c) =>
      df.select(lit(label).as("c"), col(c).cast("string").as("v"))
        .filter(col("v").isNotNull)
        .distinct()
    }.reduce(_ unionByName _)
    val groups = values.groupBy("v").agg(collect_set(col("c")).as("present"))
    groups
      .select(explode(col("present")).as("a"), col("present"))
      .select(
        col("a"),
        explode(array(labels.map(lit(_)): _*)).as("b"),
        col("present"))
      .filter(col("a") =!= col("b"))
      .groupBy("a", "b")
      .agg(
        count(lit(1)).as("n_lhs_values"),
        sum(when(!array_contains(col("present"), col("b")), 1L).otherwise(0L)).as("n_missing"))
      .withColumn("holds", col("n_missing") === 0L)
  }
}
