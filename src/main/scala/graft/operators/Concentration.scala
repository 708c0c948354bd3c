package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Concentration analysis — the Lorenz curve and exact Gini coefficient
  * of "how unevenly is activity distributed over entities" (the 80/20
  * question for users, customers, documents, hot keys). The trick that
  * makes it scale: ranking a billion entities is never needed — the
  * Lorenz curve is a function of the COUNT-OF-COUNTS histogram (m_t
  * entities with total t), so after the entity-grain aggregate the whole
  * analysis runs on ≤ |distinct totals| rows.
  *
  * Exactness: with entities ascending by total, 2·n·W·(area under
  * Lorenz) = Σ_entities (2·cumW − w), which grouped by t is
  * S = Σ_t (2·m_t·cumW_before(t) + t·m_t²) — an integer — giving
  * gini_ppm = 10⁶ − (10⁶·S) div (n·W) (0 = perfectly even,
  * → 10⁶·(1−1/n) when one entity owns everything; both spec-pinned).
  * Shares floor in bp.
  *
  * Scale shape: one map-side-combinable groupBy to entity grain, one to
  * the count-of-counts grain, TWO block-recursive [[PrefixSum]] passes
  * (entity counts and weight mass over the total-value key), one
  * broadcast single-row divisor. No global sort, no ranking window.
  *
  * Output, ascending t: (t, m, cum_entities, cum_weight,
  * entity_share_bp, weight_share_bp, gini_ppm) — the Lorenz table with
  * the scalar Gini repeated per row (engine-exact). Width contract:
  * cum_weight ≤ W = Σ t·m, and W < 2⁶³ holds whenever per-entity totals
  * are BIGINT sums to begin with, so cum_weight ships as BIGINT (the
  * Gini numerator 10⁶·S still rides DECIMAL(38,0) internally); a W that
  * breaks the contract fails loudly at the ANSI decimal→long cast.
  */
object Concentration {

  /** `df` → entity totals via count of rows per `entityCol` when
    * `weightCol` is empty, else sum of the weight column (≥ 0).
    */
  def lorenz(
      df: DataFrame,
      entityCol: String,
      weightCol: Option[String] = None): DataFrame = {
    val perEntity = weightCol match {
      case Some(w) =>
        df.select(
          col(entityCol).as("e"),
          when(col(w).cast("long") < 0,
            raise_error(concat(
              lit("Concentration.lorenz: weights must be >= 0, got "),
              col(w).cast("string"))).cast("long"))
            .otherwise(col(w).cast("long")).as("w"))
          .groupBy("e").agg(sum("w").as("t"))
      case None =>
        df.select(col(entityCol).as("e")).groupBy("e").agg(count(lit(1)).as("t"))
    }
    val hist = perEntity.groupBy("t").agg(count(lit(1)).as("m"))
    val mBefore = PrefixSum.exclusive(hist.select(col("t").as("k"), col("m").as("s")))
      .select(col("k").as("t"), col("before").as("m_before"))
    val wBefore = PrefixSum.exclusive(
      hist.select(col("t").as("k"), expr("CAST(t AS DECIMAL(38,0)) * m").as("s")))
      .select(col("k").as("t"), col("before").as("w_before"))
    val tot = hist.agg(
      sum("m").cast("decimal(38,0)").as("n"),
      sum(expr("CAST(t AS DECIMAL(38,0)) * m")).as("bigw"))
    val joined = hist.join(mBefore, "t").join(wBefore, "t")
      .crossJoin(broadcast(tot))
    val gini = joined
      .agg(sum(expr(
        """2 * CAST(m AS DECIMAL(38,0)) * w_before
          |  + CAST(t AS DECIMAL(38,0)) * m * m""".stripMargin)).as("s2a"),
        max("n").as("n"), max("bigw").as("bigw"))
      .select(expr(
        """CASE WHEN n * bigw = 0 THEN CAST(0 AS BIGINT)
          |ELSE 1000000 - (1000000 * s2a) div (n * bigw) END""".stripMargin)
        .as("gini_ppm"))
    joined
      .crossJoin(broadcast(gini))
      .select(
        col("t"),
        col("m"),
        (col("m_before") + col("m")).as("cum_entities"),
        expr("CAST(w_before + CAST(t AS DECIMAL(38,0)) * m AS BIGINT)")
          .as("cum_weight"),
        expr("CAST((10000 * (m_before + m)) div n AS BIGINT)").as("entity_share_bp"),
        expr(
          """CASE WHEN bigw = 0 THEN CAST(0 AS BIGINT)
            |ELSE (10000 * (w_before + CAST(t AS DECIMAL(38,0)) * m)) div bigw
            |END""".stripMargin).as("weight_share_bp"),
        col("gini_ppm"))
  }
}
