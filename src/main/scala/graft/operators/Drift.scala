package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distribution-shift scoring between two dataset snapshots — the
  * train/serve (or yesterday/today) drift monitor every production
  * pipeline gates on (the check PSI / population-stability-index
  * dashboards run): bucket a feature deterministically on both sides,
  * compare each bucket's share, and score the shift PER BUCKET so the
  * alarm names the buckets that moved, not just a scalar.
  *
  * The score is the χ²-shaped symmetric divergence on basis-point
  * shares, kept in EXACT INTEGERS (PSI's ln() would tie the result to an
  * engine's libm; this score ranks shifts the same way and replays
  * bit-for-bit in any engine):
  *
  *   contrib(bucket) = (a_bp − b_bp)² · 10000 div (a_bp + b_bp)
  *
  * with a_bp = a_n·10000 div a_total (floor). Σ contrib is the
  * table-level drift statistic; per-bucket contribs rank the movers.
  * Buckets absent from one side score against a 0 share — the
  * new-category / vanished-category alarms PSI handles with ε-smoothing,
  * handled here exactly.
  *
  * Scale shape: one groupBy per side on the bucket column (map-side
  * combinable counts), a full-outer join at BUCKET grain (bounded by
  * cardinality, not rows), two scalar totals. Nothing row-grain ever
  * shuffles twice.
  *
  * Output: (bucket, a_n, b_n, a_bp, b_bp, contrib), one row per bucket
  * present on either side.
  */
object Drift {

  def chiDrift(a: DataFrame, b: DataFrame, bucketCol: String): DataFrame = {
    def counts(df: DataFrame, n: String) =
      df.groupBy(col(bucketCol).as("bucket")).agg(count(lit(1)).as(n))
    val ac = counts(a, "a_n")
    val bc = counts(b, "b_n")
    val aTot = a.count()
    val bTot = b.count()
    require(aTot > 0 && bTot > 0, s"both sides must be non-empty: a=$aTot b=$bTot")
    ac.join(bc, Seq("bucket"), "full_outer")
      .select(
        col("bucket"),
        coalesce(col("a_n"), lit(0L)).as("a_n"),
        coalesce(col("b_n"), lit(0L)).as("b_n"))
      .withColumn("a_bp", expr(s"a_n * 10000 div ${aTot}L"))
      .withColumn("b_bp", expr(s"b_n * 10000 div ${bTot}L"))
      .withColumn(
        "contrib",
        when(col("a_bp") + col("b_bp") === 0L, lit(0L))
          .otherwise(expr(
            "(a_bp - b_bp) * (a_bp - b_bp) * 10000 div (a_bp + b_bp)")))
  }
}
