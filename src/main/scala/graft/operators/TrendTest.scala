package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Mann–Kendall trend test — the nonparametric "is this series
  * monotonically drifting" question (Mann 1945, Kendall 1975) asked of
  * every daily-volume, error-rate, and quality-score series before
  * anyone trusts a dashboard's eyeball trend. Distribution-free sibling
  * of [[TheilSen]] (which estimates the slope; this one scores its
  * significance) and the sequential [[ChangePoint]] CUSUM (level SHIFT
  * vs monotone DRIFT).
  *
  * S = Σ_{i<j} sgn(x_j − x_i) over time-ordered pairs, and the
  * tie-corrected null variance at 18× scale:
  *   var18 = n(n−1)(2n+5) − Σ_g t_g(t_g−1)(2t_g+5)
  * (g over tie groups of x), so z² = 18·S²/var18 ships exactly as
  *   z2_ppm = (10⁶·18·S²) div var18
  * — compare against χ²₁ critical values (3.84·10⁶ ⇔ p < 0.05, the q224
  * convention) with no floats and no continuity correction (documented:
  * the classical S∓1 correction is omitted so the statistic is a pure
  * integer function of the data).
  *
  * Scale contract: the input must already be at a BOUNDED time grain
  * with ONE value per time point (pre-aggregate upstream — the repo's
  * histogram contract); the pair comparison is a triangular self-join at
  * grain², bounded (three years of days = 6·10⁵ pairs), never data².
  * Grain size is asserted < 10⁵ by name; var18 rides DECIMAL(38,0)
  * internally and outputs BIGINT under n < 10⁶ (n³ < 2⁶³·9).
  *
  * Output: one row (n, s, var18, z2_ppm) — s > 0 is an upward trend.
  */
object TrendTest {

  def mannKendall(df: DataFrame, tCol: String, xCol: String): DataFrame = {
    val d = df.select(col(tCol).cast("long").as("t"), col(xCol).cast("long").as("x"))
    val n = d.count()
    require(n >= 2, s"TrendTest.mannKendall: need >= 2 points, got $n")
    require(n < 100000L,
      s"TrendTest.mannKendall grain contract: n must be < 1e5, got $n — " +
        "aggregate to a bounded time grain first")
    val dup = d.agg(count(lit(1)) - count_distinct(col("t"))).head().getLong(0)
    require(dup == 0L,
      s"TrendTest.mannKendall: time points must be unique ($dup duplicates) — " +
        "one value per grain point")
    val a = d.select(col("t").as("ti"), col("x").as("xi"))
    val b = d.select(col("t").as("tj"), col("x").as("xj"))
    val s = a.join(b, col("ti") < col("tj"))
      .agg(coalesce(sum(signum(col("xj") - col("xi")).cast("long")), lit(0L)).as("s"))
    val ties = d.groupBy("x").agg(count(lit(1)).as("tg"))
      .agg(coalesce(
        sum(expr("CAST(tg AS DECIMAL(38,0)) * (tg - 1) * (2 * tg + 5)")),
        lit(0).cast("decimal(38,0)")).as("tie18"))
    s.crossJoin(broadcast(ties))
      .select(
        lit(n).as("n"),
        col("s"),
        expr(s"CAST(CAST(${n}L AS DECIMAL(38,0)) * (${n}L - 1) * (2 * ${n}L + 5)" +
          " - tie18 AS BIGINT)").as("var18"),
        expr(
          """CASE WHEN (CAST(%dL AS DECIMAL(38,0)) * (%dL - 1) * (2 * %dL + 5) - tie18) = 0
            |THEN 0L
            |ELSE (1000000 * 18 * CAST(s AS DECIMAL(38,0)) * s)
            |     div (CAST(%dL AS DECIMAL(38,0)) * (%dL - 1) * (2 * %dL + 5) - tie18)
            |END""".stripMargin.format(n, n, n, n, n, n)).as("z2_ppm"))
  }
}
