package graft

import org.apache.spark.sql.functions._

import graft.streaming.StreamingCohorts

/** Streamed cohorts must equal the batch triangle under time-ordered
  * replay, including users whose activity spans micro-batches (the
  * first-seen state carries the cohort forward).
  */
class StreamingCohortsSpec extends SparkSpec {
  init()
  import spark.implicits._

  private def batchTriangle(ev: org.apache.spark.sql.DataFrame): Seq[org.apache.spark.sql.Row] = {
    val e = ev.select(col("user_id"), expr("tus div 100").as("d"))
    val f = e.groupBy("user_id").agg(min("d").as("cohort"))
    val a = e.distinct()
    val counts = a.join(f, "user_id")
      .groupBy(col("cohort").as("cohort_period"), (col("d") - col("cohort")).as("offset"))
      .agg(count(lit(1)).as("n_users"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("cohort_period")
    counts
      .withColumn("cohort_size", max(when(col("offset") === 0, col("n_users"))).over(w))
      .withColumn("retention_bp", expr("(n_users * 10000) div cohort_size"))
      .orderBy("cohort_period", "offset").collect().toSeq
  }

  test("streamed == batch across chunkings with cross-batch returns") {
    // period = tus div 100; u1 returns two periods later (different batch
    // at chunks=4), u2 active once, u3 cohorted later
    val ev = Seq(
      (1L, 10L), (1L, 250L), (1L, 930L),
      (2L, 20L),
      (3L, 500L), (3L, 910L))
      .toDF("user_id", "tus")
    val want = batchTriangle(ev)
    for (chunks <- Seq(1, 4)) {
      val got = StreamingCohorts.run(ev, "user_id", "tus", periodUs = 100L, chunks = chunks)
        .orderBy("cohort_period", "offset").collect().toSeq
      assert(got == want, s"chunks=$chunks:\n$got\nvs\n$want")
    }
    assert(want.nonEmpty)
  }

  test("streamed == batch on real events at 2 and 5 chunks") {
    val ev = core.Tables(spark, sfSmoke, "events")
      .withColumn("tus", unix_micros(col("ts")))
    val e = ev.select(col("user_id"), expr("tus div 86400000000").as("d"))
    val f = e.groupBy("user_id").agg(min("d").as("cohort"))
    val counts = e.distinct().join(f, "user_id")
      .groupBy(col("cohort").as("cohort_period"), (col("d") - col("cohort")).as("offset"))
      .agg(count(lit(1)).as("n_users"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("cohort_period")
    val want = counts
      .withColumn("cohort_size", max(when(col("offset") === 0, col("n_users"))).over(w))
      .withColumn("retention_bp", expr("(n_users * 10000) div cohort_size"))
      .orderBy("cohort_period", "offset").collect().toSeq
    for (chunks <- Seq(2, 5)) {
      val got = StreamingCohorts
        .run(ev, "user_id", "tus", periodUs = 86400000000L, chunks = chunks)
        .orderBy("cohort_period", "offset").collect().toSeq
      assert(got == want, s"chunks=$chunks diverged")
    }
  }
}
