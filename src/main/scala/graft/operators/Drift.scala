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

  /** Two-sample Kolmogorov–Smirnov distance, EXACT — the ordered-value
    * drift test [[chiDrift]]'s bucket-share score cannot be: KS sees a
    * small shift spread across every bucket (a distribution sliding
    * right) that per-bucket shares dilute. D = max_v |F_a(v) − F_b(v)|
    * kept integral as d_num = max |ca(v)·n_b − cb(v)·n_a| over the
    * merged value grain (ca = a-rows ≤ v), with D = d_num/(n_a·n_b) —
    * reported floored in basis points alongside the exact numerator, so
    * a consumer can apply any KS critical value exactly.
    *
    * Scale shape: one groupBy per side to value grain, a full-outer
    * merge at that grain, ONE [[PrefixSum.exclusive]] pass per side
    * (block-recursive, no global window), one single-row max. Values
    * must be integral non-negative (quantize/shift upstream). The merged
    * grain is persisted for its three readers and unpersisted before
    * return (the one output row rides a localCheckpoint), so repeated
    * calls leak no cached partitions.
    *
    * Output: one row (n_a, n_b, d_num, d_bp). Width contract: d_num ≤
    * n_a·n_b < 2⁶³ (comfortably true for any two samples whose sizes are
    * BIGINT counts, n ≲ 3·10⁹ each), so d_num ships as BIGINT — the
    * comparison rides DECIMAL(38,0) internally and a contract break
    * fails loudly at the ANSI decimal→long cast.
    */
  def ksStatistic(a: DataFrame, b: DataFrame, valueCol: String): DataFrame = {
    def grain(df: DataFrame, n: String) =
      df.select(
        when(col(valueCol).cast("long") < 0,
          raise_error(concat(
            lit("Drift.ksStatistic: values must be >= 0, got "),
            col(valueCol).cast("string"))).cast("long"))
          .otherwise(col(valueCol).cast("long")).as("v"))
        .groupBy("v").agg(count(lit(1)).as(n))
    val merged = grain(a, "ca").join(grain(b, "cb"), Seq("v"), "full_outer")
      .select(
        col("v"),
        coalesce(col("ca"), lit(0L)).as("ca"),
        coalesce(col("cb"), lit(0L)).as("cb"))
      .persist()
    val preA = PrefixSum.exclusive(merged.select(col("v").as("k"), col("ca").as("s")))
      .select(col("k").as("v"), col("before").as("ba"))
    val preB = PrefixSum.exclusive(merged.select(col("v").as("k"), col("cb").as("s")))
      .select(col("k").as("v"), col("before").as("bb"))
    val tot = merged.agg(
      sum("ca").cast("decimal(38,0)").as("na"),
      sum("cb").cast("decimal(38,0)").as("nb"))
    val out = merged
      .join(preA, "v").join(preB, "v")
      .crossJoin(broadcast(tot))
      .select(expr(
        """abs(CAST(ba + ca AS DECIMAL(38,0)) * nb
          |    - CAST(bb + cb AS DECIMAL(38,0)) * na) AS dd""".stripMargin),
        col("na"), col("nb"))
      .agg(
        max(col("na")).cast("long").as("n_a"),
        max(col("nb")).cast("long").as("n_b"),
        max("dd").as("d_num"))
      .select(
        col("n_a"), col("n_b"),
        col("d_num").cast("long").as("d_num"),
        expr(
          """CASE WHEN n_a = 0 OR n_b = 0 THEN CAST(0 AS BIGINT)
            |ELSE (10000 * CAST(d_num AS DECIMAL(38,0)))
            |     div (CAST(n_a AS DECIMAL(38,0)) * n_b) END"""
            .stripMargin).as("d_bp"))
      // the single output row frees the three re-reads of the merged grain
      .transform(graft.core.Materialize.apply)
    merged.unpersist()
    out
  }
}
