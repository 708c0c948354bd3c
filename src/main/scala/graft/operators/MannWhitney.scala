package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Mann–Whitney U (Wilcoxon rank-sum) — the nonparametric two-sample
  * test (Mann & Whitney 1947): does sample A stochastically dominate
  * sample B? The distribution-free sibling of [[Cuped]]'s mean
  * comparison, robust to the heavy-tailed metrics (revenue, latency)
  * where t-tests mislead.
  *
  * Everything stays integral by working at DOUBLED rank scale: ties take
  * midranks, and with value-grain counts the positions a value v
  * occupies are (before(v), before(v)+cnt(v)], so
  * 2·midrank(v) = 2·before(v) + cnt(v) + 1 — an integer. Then
  *   2R_A = Σ_v ca(v)·(2·before(v) + cnt(v) + 1),
  *   u2_a = 2U_A = 2R_A − n_a(n_a+1),  u2_b = 2·n_a·n_b − u2_a,
  *   cles_ppm = (10⁶·u2_a) div (2·n_a·n_b)   (common-language effect
  *   size, = the AUC of A-vs-B), and the tie-corrected null variance at
  *   12·n·(n−1) scale: var12s = n_a·n_b·((n+1)·n·(n−1) − Σ_v(t³−t)),
  * every division truncating (Spark `div` ≡ DuckDB `//`), so the row is
  * engine-exact. Width contract for var12s: n_a·n_b·(n+1)·n·(n−1) <
  * 10³⁸ (n ≲ 10⁷ units; beyond that use the z-approximation upstream).
  * var12s genuinely exceeds the BIGINT range (n ≈ 10⁴ already puts it at
  * ~10²⁰), so it ships as its canonical decimal STRING — digit-exact in
  * any engine, and free of the DECIMAL(38,0) value-rendering skew that
  * fails cross-engine hash comparison even on identical values.
  *
  * Scale shape: ONE groupBy to value grain (ranks are functions of the
  * histogram, never of rows), one [[PrefixSum.exclusive]] block-recursive
  * pass, one single-row aggregate — cost is the distinct-value
  * histogram. Values must be integral non-negative (quantize/shift
  * upstream); rows outside the two labels are rejected by name.
  *
  * Output: one row (n_a, n_b, u2_a, u2_b, cles_ppm, var12s).
  */
object MannWhitney {

  def uTest(
      df: DataFrame,
      sampleCol: String,
      valueCol: String,
      aLabel: String,
      bLabel: String): DataFrame = {
    require(aLabel != bLabel, s"MannWhitney.uTest: labels must differ, got '$aLabel' twice")
    val d = df.select(
      when(col(sampleCol).cast("string").isin(aLabel, bLabel),
        col(sampleCol).cast("string"))
        .otherwise(raise_error(concat(
          lit(s"MannWhitney.uTest: sample label must be '$aLabel' or '$bLabel', got "),
          col(sampleCol).cast("string")))).as("g"),
      when(col(valueCol).cast("long") < 0,
        raise_error(concat(
          lit("MannWhitney.uTest: values must be >= 0, got "),
          col(valueCol).cast("string"))).cast("long"))
        .otherwise(col(valueCol).cast("long")).as("v"))
    val grain = d.groupBy("v").agg(
      count(lit(1)).as("cnt"),
      sum(when(col("g") === aLabel, 1L).otherwise(0L)).as("ca"))
    val pre = PrefixSum.exclusive(grain.select(col("v").as("k"), col("cnt").as("s")))
      .select(col("k").as("v"), col("before"))
    grain
      .join(pre, "v")
      .agg(
        sum("ca").cast("decimal(38,0)").as("na"),
        sum("cnt").cast("decimal(38,0)").as("n"),
        sum(expr("CAST(ca AS DECIMAL(38,0)) * (2 * before + cnt + 1)")).as("r2a"),
        sum(expr("CAST(cnt AS DECIMAL(38,0)) * cnt * cnt - cnt")).as("ties"))
      .select(
        col("na").cast("long").as("n_a"),
        expr("CAST(n - na AS BIGINT)").as("n_b"),
        expr("CAST(r2a - na * (na + 1) AS BIGINT)").as("u2_a"),
        expr("CAST(2 * na * (n - na) - (r2a - na * (na + 1)) AS BIGINT)").as("u2_b"),
        expr(
          """CASE WHEN na = 0 OR n - na = 0 THEN CAST(0 AS BIGINT)
            |ELSE (1000000 * (r2a - na * (na + 1))) div (2 * na * (n - na)) END"""
            .stripMargin).as("cles_ppm"),
        expr("CAST(na * (n - na) * ((n + 1) * n * (n - 1) - ties) AS STRING)")
          .as("var12s"))
  }
}
