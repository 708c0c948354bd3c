package graft

import org.apache.spark.sql.functions._

import graft.functions.InterleaveBits

/** Interleave correctness, codegen, domain guard, and the point of
  * z-order: range-bucketing by z keeps BOTH dimensions' per-bucket spread
  * narrow (file-level min/max stats stay selective on either column).
  */
class ZOrderSpec extends SparkSpec {
  init()
  import spark.implicits._

  test("known interleavings") {
    assert(InterleaveBits.interleave(0L, 0L) == 0L)
    assert(InterleaveBits.interleave(3L, 1L) == 11L) // a→bits 1,3; b→bit 0
    assert(InterleaveBits.interleave(0L, 3L) == 5L)
    assert(InterleaveBits.interleave(1L << 30, 0L) == 1L << 61)
    val max = (1L << 31) - 1
    assert(InterleaveBits.interleave(max, max) == (1L << 62) - 1)
    intercept[Exception](InterleaveBits.interleave(1L << 31, 0L))
    intercept[Exception](InterleaveBits.interleave(-1L, 0L))
  }

  test("expression runs inside whole-stage codegen") {
    InterleaveBits.register(spark)
    // spark.range (not a literal Seq): a local relation constant-folds the
    // whole projection into LocalTableScan and there is no codegen stage
    val df = spark.range(2, 4)
      .select(InterleaveBits.interleave_bits(col("id"), col("id") + 1).as("z"))
    val inCodegen = df.queryExecution.executedPlan
      .find(_.isInstanceOf[org.apache.spark.sql.execution.WholeStageCodegenExec])
      .isDefined
    assert(inCodegen, df.queryExecution.executedPlan.toString)
    // (2,3)→ spread(2)<<1|spread(3) = 0b1000|0b101 = 13; (3,4)→ 0b1010|0b10000 = 26
    assert(df.as[Long].collect().toSeq == Seq(13L, 26L))
  }

  test("z-order buckets bound both dimensions' spread; single-column sort doesn't") {
    InterleaveBits.register(spark)
    // 64×64 grid, one row per cell, visited in row-major (x-sorted) order
    val grid = (for (x <- 0 until 64; y <- 0 until 64) yield (x.toLong, y.toLong))
      .toDF("x", "y")
      .withColumn("z", InterleaveBits.interleave_bits(col("x"), col("y")))
    val nBuckets = 16
    def avgSpread(orderCol: String, dim: String): Double = {
      val w = org.apache.spark.sql.expressions.Window.orderBy(col(orderCol))
      grid
        .withColumn("bucket", ntile(nBuckets).over(w))
        .groupBy("bucket")
        .agg((max(col(dim)) - min(col(dim))).as("spread"))
        .agg(avg("spread")).head().getDouble(0)
    }
    // sorted by x alone: y spread per bucket is the full domain (63)
    val ySpreadXSort = avgSpread("x", "y")
    val ySpreadZSort = avgSpread("z", "y")
    val xSpreadZSort = avgSpread("z", "x")
    assert(ySpreadXSort > 60, s"x-sort should not bound y: $ySpreadXSort")
    assert(ySpreadZSort < 32, s"z-sort must bound y spread: $ySpreadZSort")
    assert(xSpreadZSort < 32, s"z-sort must bound x spread: $xSpreadZSort")
  }
}
