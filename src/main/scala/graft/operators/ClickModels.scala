package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** COEC — clicks over expected clicks (Zhang & Jones 2007; the standard
  * position-bias-corrected CTR): an item shown mostly at rank 8 with a
  * 2 % CTR may be far better than one shown at rank 1 with 3 %, because
  * rank 1 gets clicked regardless. COEC divides an item's observed clicks
  * by the clicks EXPECTED at its impression positions:
  *
  *   coec = clicks(item) / Σ_{impressions of item} baseCTR(position)
  *
  * where baseCTR(p) is the position's global CTR. COEC > 1 ⇒ the item
  * out-pulls its slots. Everything is exact integers: baseCTR in ppm by
  * floor division, expected clicks as a plain ppm SUM, and the final
  * ratio in basis points — ⌊10⁴·clicks·10⁶ / Σ ppm⌋.
  *
  * Scale shape: one map-side-combinable groupBy(position) for the
  * baseline (positions are few — broadcast), one groupBy(item) for the
  * ratio. Impression logs at 100 TB pass through exactly once, no
  * windows, no joins bigger than item-grain × position-count.
  */
object ClickModels {

  /** Input: one row per impression with (itemCol, positionCol,
    * clickedCol ∈ {0,1}). Output per item:
    * (item, n_imp, n_clicks, expected_ppm, coec_bp) — coec_bp NULL for
    * items whose every impression sat at a zero-CTR position.
    */
  def coec(
      df: DataFrame,
      itemCol: String,
      positionCol: String,
      clickedCol: String): DataFrame = {
    val im = df.select(
      col(itemCol).as("item"),
      col(positionCol).cast("long").as("pos"),
      col(clickedCol).cast("long").as("clk"))
    val base = im
      .groupBy("pos")
      .agg(count(lit(1)).as("pn"), sum("clk").as("pc"))
      .select(col("pos"), expr("(1000000 * pc) div pn").as("base_ppm"))
    im
      .join(broadcast(base), "pos")
      .groupBy("item")
      .agg(
        count(lit(1)).as("n_imp"),
        sum("clk").as("n_clicks"),
        sum("base_ppm").as("expected_ppm"))
      .select(
        col("item"), col("n_imp"), col("n_clicks"), col("expected_ppm"),
        expr("""CASE WHEN expected_ppm = 0 THEN NULL
                ELSE (10000 * n_clicks * 1000000) div expected_ppm
                END""").as("coec_bp"))
  }
}
