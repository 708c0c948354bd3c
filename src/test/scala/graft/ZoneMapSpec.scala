package graft

import org.apache.spark.sql.functions._

import graft.functions.InterleaveBits
import graft.operators.ZoneMap

/** Zone-map pruning: identical rows to the plain filter, and the z-order
  * layout actually skips buckets on BOTH dimensions of a 2-d predicate
  * where a single-column layout can only skip on its sort column.
  */
class ZoneMapSpec extends SparkSpec {
  init()
  import spark.implicits._

  // 64×64 grid of (x, y) points
  private def grid = {
    InterleaveBits.register(spark)
    (for (x <- 0 until 64; y <- 0 until 64) yield (x.toLong, y.toLong))
      .toDF("x", "y")
      .withColumn("z", InterleaveBits.interleave_bits(col("x"), col("y")))
  }

  test("pruned filter equals the plain filter") {
    val g = grid
    val maxZ = g.agg(max("z")).head().getLong(0)
    val bucketed = g.withColumn("zb", expr(s"z div ${maxZ / 64 + 1}L"))
    val stats = ZoneMap.collect(bucketed, "zb", Seq("x", "y"))
    val preds = Seq(("x", 10L, 20L), ("y", 30L, 40L))
    val got = ZoneMap.prunedFilter(bucketed, stats, "zb", preds)
      .select("x", "y").orderBy("x", "y").collect().toSeq
    val want = g.filter(col("x").between(10, 20) && col("y").between(30, 40))
      .select("x", "y").orderBy("x", "y").collect().toSeq
    assert(got == want)
    assert(want.size == 11 * 11)
  }

  test("stats merge: zone map of appended slices == zone map of the union") {
    val g = grid
    val maxZ = g.agg(max("z")).head().getLong(0)
    val bucketed = g.withColumn("zb", expr(s"z div ${maxZ / 16 + 1}L"))
    val (sliceA, sliceB) =
      (bucketed.filter(col("x") < 32), bucketed.filter(col("x") >= 32))
    val whole = ZoneMap.collect(bucketed, "zb", Seq("x", "y"))
      .orderBy("zb").collect().toSeq
    val merged = ZoneMap.merge(
        ZoneMap.collect(sliceA, "zb", Seq("x", "y"))
          .unionByName(ZoneMap.collect(sliceB, "zb", Seq("x", "y"))),
        "zb", Seq("x", "y"))
      .orderBy("zb").collect().toSeq
    assert(merged == whole)
  }

  test("z-order layout skips buckets on both dims; x-sorted layout cannot skip on y") {
    val g = grid
    val maxZ = g.agg(max("z")).head().getLong(0)
    val zBucketed = g.withColumn("zb", expr(s"z div ${maxZ / 64 + 1}L"))
    val zStats = ZoneMap.collect(zBucketed, "zb", Seq("x", "y"))
    // x-sorted layout: bucket by x ranges (the compound-sort strawman)
    val xBucketed = g.withColumn("zb", expr("x div 1"))
    val xStats = ZoneMap.collect(xBucketed, "zb", Seq("x", "y"))
    val preds = Seq(("x", 10L, 20L), ("y", 30L, 40L))
    val nAll = 64
    val zTouched = ZoneMap.candidateBuckets(zStats, "zb", preds).length
    val yOnly = Seq(("y", 30L, 40L))
    val zTouchedY = ZoneMap.candidateBuckets(zStats, "zb", yOnly).length
    val xTouchedY = ZoneMap.candidateBuckets(xStats, "zb", yOnly).length
    assert(zTouched < nAll / 2, s"2-d predicate should skip most z buckets: $zTouched/$nAll")
    assert(zTouchedY < nAll / 2, s"y-only predicate should still skip z buckets: $zTouchedY/$nAll")
    assert(xTouchedY == 64, s"x-sorted layout cannot skip on y: $xTouchedY")
  }
}
