package graft

import org.apache.spark.sql.functions._

import graft.operators.SimilaritySearch

/** Persisted-IVF-index contract: probe-from-disk equals the inline path,
  * and pruneCells pushes a cell partition filter into the parquet scan.
  */
class IvfIndexSpec extends SparkSpec {
  init()

  private def emb = core.Tables(spark, sfSmoke, "embeddings")
  private def corpus = emb.select(col("vec_id").as("n_id"), col("embedding").as("n_emb"))
  private def queries = emb.filter(col("vec_id") < 5)
    .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))

  test("probe from persisted index equals the inline ivfTopK") {
    val inline0 = SimilaritySearch.ivfTopK(queries, corpus, k = 5, nCells = 16, nProbe = 4)
      .orderBy("q_id", "rank").collect().toSeq
    val (cent, asg) = SimilaritySearch.buildIvfIndex(corpus, nCells = 16)
    val out = java.nio.file.Files.createTempDirectory("graft-ivfspec-").toString
    cent.write.mode("overwrite").parquet(s"$out/centroids")
    asg.write.mode("overwrite").partitionBy("cell").parquet(s"$out/assigned")
    for (prune <- Seq(false, true)) {
      val got = SimilaritySearch.ivfTopKFromIndex(
          queries,
          spark.read.parquet(s"$out/centroids"),
          spark.read.parquet(s"$out/assigned"),
          k = 5, nProbe = 4, pruneCells = prune)
        .orderBy("q_id", "rank").collect().toSeq
      assert(got == inline0, s"pruneCells=$prune diverged from inline")
    }
  }

  test("pruneCells pushes a cell partition filter into the scan") {
    val (cent, asg) = SimilaritySearch.buildIvfIndex(corpus, nCells = 16)
    val out = java.nio.file.Files.createTempDirectory("graft-ivfspec2-").toString
    cent.write.mode("overwrite").parquet(s"$out/centroids")
    asg.write.mode("overwrite").partitionBy("cell").parquet(s"$out/assigned")
    val probe = SimilaritySearch.ivfTopKFromIndex(
      queries,
      spark.read.parquet(s"$out/centroids"),
      spark.read.parquet(s"$out/assigned"),
      k = 5, nProbe = 2, pruneCells = true)
    val plan = probe.queryExecution.executedPlan.toString
    // the assigned-side scan must carry the cell isin as a PARTITION
    // filter (directory pruning), not just a data filter
    assert(plan.contains("PartitionFilters: [cell"), plan.take(4000))
    assert(probe.count() > 0)
  }
}
