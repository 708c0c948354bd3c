package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.streaming.{AdaptiveWindowController, SemiStreamRuntime}

/** Streaming query pack: the semi-stream join run through the REAL
  * Structured Streaming runtime (readStream → foreachBatch → CacheManager),
  * not a batch analogue. Correctness leans on the bag-union invariant — the
  * accumulated per-batch outputs equal the plain join regardless of how the
  * stream was chunked or what the cache did — so the DuckDB oracle is the
  * plain-join SQL (same contract as the reference's `data|out|` count
  * checks, `DS-Join/DS_join_step4/src/main/scala/streaming.scala:607-615`).
  */
object StreamingQueries {

  private def t(s: SparkSession, dir: String, name: String) = Tables(s, dir, name)

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Full streaming path (SURVEY S1/S2, J1–J9, §2.7): lineitem replayed as
    // 8 micro-batches (chunked by l_orderkey so partkeys recur across
    // batches and the cache serves real hits), joined against stored part
    // through the LRU cache + adaptive window, outputs accumulated and
    // aggregated exactly like batch q6.
    "q17_stream_semistream_join" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
        .select(col("l_partkey").as("p_partkey"), col("l_orderkey"), col("l_quantity"))
      val part = t(s, dir, "part")
      val cache = part.filter(pmod(col("p_partkey"), lit(10)) < 3)
      val (out, _) = SemiStreamRuntime.semiStreamJoin(
        li, part, cache,
        key = "p_partkey", chunkKey = "l_orderkey", chunks = 8,
        config = AdaptiveWindowController.Config(initialWindow = 2, warmupBatches = 2))
      out.groupBy("p_brand")
        .agg(count(lit(1)).as("n"), round(sum("l_quantity"), 2).as("sum_qty"))
        .orderBy("p_brand")
    }))

  val oracles: Map[String, String] = Map(
    "q17_stream_semistream_join" ->
      """SELECT p_brand, count(*) AS n, round(sum(l_quantity), 2) AS sum_qty
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY 1 ORDER BY 1""".stripMargin)
}
