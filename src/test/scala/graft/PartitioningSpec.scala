package graft

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.streaming.{AdaptiveWindowController, CacheManager}

/** Physical-distribution hygiene (SURVEY D1/D3, P7): bucketed stored
  * tables join without a shuffle; explicit co-partitioning reuses the
  * exchange; the frequency-based cache-admission hook actually bounds what
  * enters the cache.
  */
class PartitioningSpec extends SparkSpec {
  init()

  test("bucketed stored tables join with no shuffle on the bucketed key (D1)") {
    val wh = java.nio.file.Files.createTempDirectory("graft-wh-").toString
    val s = spark.newSession()
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val li = Tables(s, sfSmoke, "lineitem").select("l_partkey", "l_quantity")
    val part = Tables(s, sfSmoke, "part").select("p_partkey", "p_brand")
    li.write.mode("overwrite").option("path", s"$wh/li_b")
      .bucketBy(8, "l_partkey").saveAsTable("li_b")
    part.write.mode("overwrite").option("path", s"$wh/part_b")
      .bucketBy(8, "p_partkey").saveAsTable("part_b")
    val joined = s.table("li_b")
      .join(s.table("part_b"), col("l_partkey") === col("p_partkey"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n$plan")
    assert(joined.count() > 0)
    s.sql("DROP TABLE li_b"); s.sql("DROP TABLE part_b")
  }

  test("explicit co-partitioning: groupBy on the partition key adds no second exchange (D3)") {
    val agg = Tables(spark, sfSmoke, "lineitem")
      .repartition(8, col("l_partkey"))
      .groupBy("l_partkey").agg(sum("l_quantity"))
    val plan = agg.queryExecution.executedPlan.toString
    // exactly the explicit repartition exchange — the aggregation reuses it
    val exchanges = "Exchange".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected only the explicit repartition exchange:\n$plan")
  }

  test("frequency-based cache admission (P7) bounds what enters the cache") {
    val li = Tables(spark, sfSmoke, "lineitem")
      .select(col("l_partkey").as("p_partkey"), col("l_orderkey"))
    val part = Tables(spark, sfSmoke, "part")
    val emptySeed = part.limit(0)

    // admit only keys with p_partkey < 100 (stand-in for the reference's
    // freq < 50 rule, DS_SimJoin_stream.scala:838 — any predicate works)
    val admit: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame =
      _.filter(col("p_partkey") < 100)
    val mgr = new CacheManager(
      part, emptySeed, "p_partkey",
      AdaptiveWindowController.Config(initialWindow = 100, warmupBatches = 100),
      checkpointEvery = 0,
      admit = admit)
    try {
      mgr.processBatch(li)(_.count())
      val cached = mgr.cacheSnapshot
      assert(cached.filter(col("p_partkey") >= 100).count() == 0,
        "admission filter leaked keys into the cache")
      assert(cached.count() > 0, "admission admitted nothing")
    } finally mgr.close()
  }
}
