package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scale-safe per-group top-k (SURVEY W5).
  *
  * A single `Window.partitionBy(group)` funnels every row of a group into one
  * task — with a low-cardinality group column (e.g. 5 order priorities) the
  * whole table serializes through 5 tasks regardless of cluster size. This
  * operator runs two phases instead:
  *
  *   1. local: rows are sharded by a deterministic hash into `shards`
  *      sub-groups per group; each (group, shard) keeps its own top-k —
  *      `groups × shards` parallel tasks, each seeing ~1/shards of the data;
  *   2. global: the surviving `groups × shards × k` rows (tiny) get the final
  *      per-group rank.
  *
  * Same answer as the single window provided `order` is a total order
  * (callers must include a unique tiebreaker column): the global top-k rows
  * each survive their shard's local top-k, so phase 2 sees a superset.
  *
  * Capability re-expressed from the reference's cost-ranked selection
  * (`DSim-Join/src/main/scala/ds_join/DS_SimJoin_stream_ver3.scala:501-532`),
  * which sorts within partitions and keeps a bounded prefix — phase 1 is the
  * same idea planned as a window over hash shards.
  */
object TopK {

  def perGroup(
      df: DataFrame,
      groupCols: Seq[String],
      order: Seq[Column],
      k: Int,
      rankCol: String = "rk",
      shards: Int = 64): DataFrame = {
    val shard = pmod(xxhash64(df.columns.map(col): _*), lit(shards))
    val localW = Window
      .partitionBy((groupCols.map(col) :+ col("__shard")): _*)
      .orderBy(order: _*)
    val globalW = Window.partitionBy(groupCols.map(col): _*).orderBy(order: _*)
    df.withColumn("__shard", shard)
      .withColumn("__lrk", row_number().over(localW))
      .filter(col("__lrk") <= k)
      .drop("__shard", "__lrk")
      .withColumn(rankCol, row_number().over(globalW))
      .filter(col(rankCol) <= k)
  }
}
