package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Frequent 2-itemset mining (A-Priori, support-pruned): pairs of items
  * that co-occur in at least `minSupport` baskets, scored by lift — the
  * association counterpart of [[Collocations]] (which sees only ADJACENT
  * words; this sees any co-occurrence within a basket/document).
  *
  * The A-Priori property does the scale work: a pair can only be
  * frequent if BOTH items are, so item document-frequencies computed
  * first (one map-side-combined pass) prune the per-basket explode to
  * frequent items before any pair is formed. Pair candidates are a
  * basket-keyed self-join of that pruned, DEDUPLICATED item list —
  * volume Σ f_b² over frequent items per basket, never |vocab|².
  *
  * Lift = n_baskets·c(xy)/(df(x)·df(y)) as ONE IEEE multiply + divide of
  * exactly-converted integers (the [[Collocations]] oracle-exactness
  * recipe).
  */
object Itemsets {

  /** Frequent co-occurring pairs: (x, y, cxy, dfx, dfy, lift), x < y,
    * cxy ≥ minSupport.
    */
  def frequentPairs(
      baskets: DataFrame,
      basketCol: String,
      itemCol: String,
      minSupport: Long): DataFrame = {
    require(minSupport >= 1)
    val items = baskets
      .select(col(basketCol).as("b"), col(itemCol).cast("string").as("i"))
      .distinct() // presence, not multiplicity — basket semantics
    val df_ = items.groupBy("i").agg(count(lit(1)).as("df"))
    val frequent = df_.filter(col("df") >= minSupport)
    // frequent-item prune BEFORE pairing (A-Priori): the join is on item —
    // the frequent set is vocabulary-sized, broadcast when small, hash
    // join otherwise; Catalyst decides from stats
    val pruned = items.join(frequent, "i")
    val nBaskets = items.select("b").distinct().count()
    val a = pruned.select(col("b"), col("i").as("x"), col("df").as("dfx"))
    val b = pruned.select(col("b"), col("i").as("y"), col("df").as("dfy"))
    a.join(b, "b")
      .filter(col("x") < col("y"))
      .groupBy("x", "y", "dfx", "dfy")
      .agg(count(lit(1)).as("cxy"))
      .filter(col("cxy") >= minSupport)
      .withColumn(
        "lift",
        round(
          col("cxy").cast("double") * lit(nBaskets.toDouble) /
            (col("dfx").cast("double") * col("dfy").cast("double")),
          4))
      .select("x", "y", "cxy", "dfx", "dfy", "lift")
  }
}
