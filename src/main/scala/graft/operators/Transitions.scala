package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** First-order Markov transition table over keyed event sequences: for
  * each (state, next-state) pair, the transition count and the exact
  * basis-point conditional probability P(next | state) — the product
  * analytics "what do users do after X" table and the behavioral sibling
  * of the text bigram LM (q108), which shares the count→conditional
  * shape but not the keyed-sequence construction.
  *
  * Successor pairs come from a per-key lag window ordered by (ts,
  * tiebreak) — the sessionization bound again (a key's events fit a
  * task; [[HotKeyGuard]] names it) — then ONE map-side-combinable
  * groupBy(state, next) count plus a broadcast-sized per-state total
  * join. Nothing global ever sorts; the transition relation is
  * state²-bounded output.
  *
  * Output: (state, next, n, p_bp) with p_bp = ⌊10⁴·n / n_state⌋.
  */
object Transitions {

  def matrix(
      df: DataFrame,
      keyCol: String,
      tsCol: String,
      tiebreakCol: String,
      stateCol: String,
      maxEventsPerKey: Long = 1000000L): DataFrame = {
    val ev0 = df.select(
      col(keyCol).as("k"),
      col(tsCol).cast("long").as("t"),
      col(tiebreakCol).cast("long").as("tb"),
      col(stateCol).cast("string").as("state"))
    val ev = HotKeyGuard(ev0, col("k"), maxEventsPerKey, "Transitions.matrix")
    val w = Window.partitionBy("k").orderBy(col("t"), col("tb"))
    val pairs = ev
      .withColumn("next", lead("state", 1).over(w))
      .filter(col("next").isNotNull)
    val counts = pairs.groupBy("state", "next").agg(count(lit(1)).as("n"))
    val totals = counts.groupBy("state").agg(sum("n").as("n_state"))
    counts
      .join(broadcast(totals), "state")
      .select(
        col("state"), col("next"), col("n"),
        expr("(10000 * n) div n_state").as("p_bp"))
  }
}
