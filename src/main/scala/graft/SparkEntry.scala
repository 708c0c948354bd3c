package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.operators.SemiStreamJoin

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates the per-module query packs; every entry that is
  * ANSI-SQL-expressible has a DuckDB oracle in `oracleSql` with identical
  * output column names (the driver sorts columns by name before hashing).
  */
object SparkEntry {

  /** Flagship: the DS-Join semi-stream equi-join path on sf0.001 —
    * hits-from-cache ∪ fetched-misses, aggregated by brand.
    */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val li = Tables(spark, dir, "lineitem")
      .select(col("l_partkey").as("p_partkey"), col("l_orderkey"), col("l_quantity"))
    val part = Tables(spark, dir, "part")
    val cache = part.filter(pmod(col("p_partkey"), lit(10)) < 3)
    val r = SemiStreamJoin.joinWithStore(li, cache, part, "p_partkey")
    r.out.groupBy("p_brand").agg(count(lit(1)).as("n"))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.RelationalQueries.defs ++
      graft.queries.RelationalQueries.gapDefs ++
      graft.queries.StreamingQueries.defs ++
      graft.queries.DocumentQueries.defs ++
      graft.queries.SeqMatchQueries.defs ++
      graft.queries.MlQueries.defs

  /** DuckDB-equivalent SQL per query (same parquet tables, same column names). */
  def oracleSql: Map[String, String] =
    graft.queries.RelationalQueries.oracles ++
      graft.queries.RelationalQueries.gapOracles ++
      graft.queries.StreamingQueries.oracles ++
      graft.queries.DocumentQueries.oracles ++
      graft.queries.SeqMatchQueries.oracles ++
      graft.queries.MlQueries.oracles
}
