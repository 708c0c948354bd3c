package graft

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.operators.SemiStreamJoin
import graft.queries.RelationalQueries

class RelationalQueriesSpec extends SparkSpec {
  init()

  test("every relational query runs and returns rows on sf0.001") {
    RelationalQueries.defs.foreach { case (name, fn) =>
      val n = fn(spark, sfSmoke).count()
      assert(n > 0, s"$name returned no rows")
    }
  }

  test("every query has an oracle") {
    assert(RelationalQueries.defs.keySet == RelationalQueries.oracles.keySet)
  }

  test("every aggregated query has an oracle (ALL packs, both map pairs)") {
    // the round-13 lesson: defs and oracles live in PAIRED maps per pack
    // (defs/oracles and gapDefs/gapOracles) — this asserts the pairing at
    // the aggregated SparkEntry surface, so a def landed in one pair with
    // its oracle in the other can never ship
    assert(SparkEntry.queries.keySet == SparkEntry.oracleSql.keySet)
  }

  test("query roster is contiguous q1..qN with no duplicate numbers") {
    val nums = SparkEntry.queries.keySet.toSeq
      .map(_.drop(1).takeWhile(_.isDigit).toInt)
    assert(nums.distinct.size == nums.size,
      s"duplicate query numbers: ${nums.diff(nums.distinct).distinct.sorted}")
    assert(nums.toSet == (1 to nums.max).toSet,
      s"roster gaps: ${((1 to nums.max).toSet -- nums.toSet).toSeq.sorted}")
  }

  test("semi-stream join (hits ∪ fetched misses) equals the plain join") {
    val li = Tables(spark, sfSmoke, "lineitem")
      .select(col("l_partkey").as("p_partkey"), col("l_orderkey"), col("l_quantity"))
    val part = Tables(spark, sfSmoke, "part")
    val cache = part.filter(pmod(col("p_partkey"), lit(10)) < 3)
    val r = SemiStreamJoin.joinWithStore(li, cache, part, "p_partkey")
    val plain = li.join(part, "p_partkey")
    assert(r.out.count() == plain.count())
    assert(r.out.exceptAll(plain).isEmpty && plain.exceptAll(r.out).isEmpty)
    // fetched = stored rows for keys absent from the cache but present in the batch
    val missedKeys = li.join(cache, Seq("p_partkey"), "left_anti")
      .select("p_partkey").distinct().count()
    assert(r.fetched.count() == missedKeys) // p_partkey is unique in part
    r.release()
  }

  test("hit/miss split partitions the batch") {
    val li = Tables(spark, sfSmoke, "lineitem")
      .select(col("l_partkey").as("p_partkey"), col("l_orderkey"))
    val part = Tables(spark, sfSmoke, "part")
    val cache = part.filter(pmod(col("p_partkey"), lit(10)) < 3).select("p_partkey")
    val s = SemiStreamJoin.split(li, cache, "p_partkey")
    assert(s.hits.count() + s.misses.count() == li.count())
  }
}
