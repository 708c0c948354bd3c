package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-min sketch as a relational operator: a depth×width grid of
  * partial-aggregated counts that answers frequency queries with bounded
  * overestimate — the fixed-size substitute for `groupBy(item).count`
  * when the item domain (vocabulary, URL space, user ids) is too large to
  * materialize per-key.
  *
  * Why the sketch is a DATAFRAME of (r, cell, cnt) rows rather than an
  * opaque array blob: the grid is what partial aggregation already
  * produces — each map task combines its occurrences into ≤ depth·width
  * local rows, the reduce merges ≤ depth·width rows per partition, and
  * the result broadcasts to any estimation join. Counts are exact
  * integers and the cell hash is the repo's md5 recipe, so every
  * downstream decision is engine-portable and SQL-oracle-able (the same
  * determinism contract as [[Sampling]]/[[ImportanceResampling]]).
  *
  * Scale math vs exact counting: shuffle volume is min(occurrences,
  * depth·width) rows per map task instead of min(occurrences, |vocab|) —
  * at web scale |vocab| is billions while depth·width stays a few
  * thousand. Estimates never undercount (every occurrence increments all
  * its cells); overcount per row is bounded by collisions, and the min
  * over `depth` independent rows makes a large overestimate
  * exponentially unlikely (the standard CM guarantee: err ≤ e·N/width
  * with prob ≥ 1 − e^−depth).
  */
object CountMin {

  /** Cell of `item` in sketch row `r`: first 8 md5 hex chars of
    * "r:item" mod width.
    */
  def cell(r: Column, item: Column, width: Int): Column =
    pmod(
      conv(substring(md5(concat(r.cast("string"), lit(":"), item)), 1, 8), 16, 10)
        .cast("long"),
      lit(width))

  /** Build the sketch over item OCCURRENCES: (r, cell, cnt), ≤ depth·width
    * rows. Mergeable by construction — sketches of two corpora union+sum.
    */
  def sketch(items: DataFrame, itemCol: String, depth: Int, width: Int): DataFrame = {
    require(depth > 0 && width > 0, s"depth/width must be positive: $depth/$width")
    items
      .select(col(itemCol).as("__i"), explode(sequence(lit(0), lit(depth - 1))).as("r"))
      .withColumn("cell", cell(col("r"), col("__i"), width))
      .groupBy("r", "cell")
      .agg(count(lit(1)).as("cnt"))
  }

  /** Point estimates for candidate items: (itemCol, est) with
    * est = min over rows of the item's cell count (0 for items the sketch
    * never saw). The sketch side broadcasts — estimation is a probe, not
    * a shuffle.
    */
  def estimate(
      candidates: DataFrame,
      itemCol: String,
      sk: DataFrame,
      depth: Int,
      width: Int): DataFrame =
    candidates
      .select(col(itemCol), explode(sequence(lit(0), lit(depth - 1))).as("r"))
      .withColumn("cell", cell(col("r"), col(itemCol), width))
      .join(broadcast(sk), Seq("r", "cell"), "left")
      .groupBy(col(itemCol))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))

  /** Heavy hitters with exact verification: sketch-estimate every distinct
    * item, keep est ≥ threshold, then count the SURVIVORS exactly (the
    * second pass touches only rows whose item passed the sketch — no
    * undercounting means no true heavy hitter is ever lost, so the exact
    * column certifies precision while the sketch bounds the candidate
    * set). Output: (itemCol, est, exact).
    */
  def heavyHitters(
      items: DataFrame,
      itemCol: String,
      depth: Int,
      width: Int,
      threshold: Column): DataFrame = {
    val sk = sketch(items, itemCol, depth, width)
    val hh = estimate(items.select(itemCol).distinct(), itemCol, sk, depth, width)
      .filter(col("est") >= threshold)
    val exact = items
      .join(broadcast(hh.select(itemCol)), Seq(itemCol))
      .groupBy(col(itemCol))
      .agg(count(lit(1)).as("exact"))
    hh.join(exact, itemCol)
  }
}
