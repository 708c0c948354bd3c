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

  test("upsert merges additions under frozen centroids; probe equals full assignment") {
    val initial = emb.filter(col("vec_id") >= 200)
      .select(col("vec_id").as("n_id"), col("embedding").as("n_emb"))
    val adds = emb.filter(col("vec_id") < 200)
      .select(col("vec_id").as("n_id"), col("embedding").as("n_emb"))
    val (cents, assigned) = SimilaritySearch.buildIvfIndex(initial, 16)
    val merged = assigned.unionByName(SimilaritySearch.upsertIvfIndex(cents, adds))
    // contract: merged index == every vector assigned against the SAME
    // frozen centroids in one pass
    val expected = SimilaritySearch.upsertIvfIndex(cents, corpus)
    assert(merged.select("n_id", "cell").exceptAll(expected.select("n_id", "cell")).isEmpty)
    assert(expected.select("n_id", "cell").exceptAll(merged.select("n_id", "cell")).isEmpty)
    val viaMerged = SimilaritySearch.ivfTopKFromIndex(queries, cents, merged, 5)
      .select("q_id", "n_id", "rank")
    val viaFull = SimilaritySearch.ivfTopKFromIndex(queries, cents, expected, 5)
      .select("q_id", "n_id", "rank")
    assert(viaMerged.exceptAll(viaFull).isEmpty && viaFull.exceptAll(viaMerged).isEmpty)
  }

  test("dynamic-overwrite upsert rewrites ONLY the additions' cell directories") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf-upsert-").toString + "/idx"
    val initial = emb.filter(col("vec_id") >= 200)
      .select(col("vec_id").as("n_id"), col("embedding").as("n_emb"))
    val adds = emb.filter(col("vec_id") < 20)
      .select(col("vec_id").as("n_id"), col("embedding").as("n_emb"))
    val (cents, assigned) = SimilaritySearch.buildIvfIndex(initial, 16)
    assigned.write.partitionBy("cell").parquet(dir)

    def cellFiles(): Map[String, Set[String]] =
      new java.io.File(dir).listFiles().filter(_.getName.startsWith("cell="))
        .map(d => d.getName -> d.listFiles().map(f => f.getName + ":" + f.lastModified())
          .toSet).toMap
    val before = cellFiles()

    val up = SimilaritySearch.upsertIvfIndex(cents, adds).persist()
    val touched = up.select("cell").distinct().collect().map("cell=" + _.get(0)).toSet
    // localCheckpoint cuts the file-source lineage so the read-merge-write
    // back into the same directory is legal (Spark rejects overwriting a
    // path still being read)
    val prev = spark.read.parquet(dir).filter(col("cell").isin(
        touched.map(_.stripPrefix("cell=").toInt).toSeq: _*))
      .select("n_id", "n_emb", "cell")
      .localCheckpoint(true)
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try prev.unionByName(up).write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic").partitionBy("cell").parquet(dir)
    finally spark.conf.unset("spark.sql.sources.partitionOverwriteMode")

    val after = cellFiles()
    val untouched = before.keySet -- touched
    assert(untouched.nonEmpty, "fixture should leave some cells untouched")
    for (c <- untouched)
      assert(after(c) == before(c), s"untouched $c was rewritten")
    // merged read-back equals the one-pass frozen-centroid assignment
    val expected = SimilaritySearch.upsertIvfIndex(
      cents, emb.filter(col("vec_id") >= 200 || col("vec_id") < 20)
        .select(col("vec_id").as("n_id"), col("embedding").as("n_emb")))
    val got = spark.read.parquet(dir).select("n_id", "cell")
    assert(got.exceptAll(expected.select("n_id", "cell")).isEmpty &&
      expected.select("n_id", "cell").exceptAll(got).isEmpty)
    up.unpersist()
    ()
  }
}
