package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.operators.SimilarityJoin

/** Semi-stream SIMILARITY join — the full DSim-Join streaming capability
  * (`DSim-Join/src/main/scala/ds_join/DS_SimJoin_stream.scala:455-866`):
  * a stream of query documents probes a precomputed signature index
  * through a SIGNATURE-KEYED LRU cache; only cache-missed signatures hit
  * the stored index (the reference's executor-side `in("signature", …)`
  * fetch, `:774-801`), fetched signature rows are admitted to the cache
  * under the frequency rule (freq < 50, `:838`), and candidates are
  * verified with exact Jaccard per batch.
  *
  * Composition over duplication: the cross-batch sig-cache/LRU/controller
  * is the SAME [[CacheManager]] as the equi-join path, keyed by `sig`
  * instead of a row key — exactly how the reference shares its cache
  * machinery between DS-Join and DSim-Join.
  */
object SemiStreamSimilarityJoin {

  final case class Result(
      pairs: DataFrame, // (x_id, y_id, inter, uni) verified, accumulated
      stats: Seq[CacheManager.BatchStats])

  /** Stream `docs` (replayed in `chunks` micro-batches) against the static
    * signature index of the same corpus. Output: every ordered pair
    * (x stream doc, y stored doc), x≠y, Jaccard ≥ τ.
    */
  def run(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      tau: Double,
      chunks: Int = 4,
      maxSigFrequency: Long = 50,
      config: AdaptiveWindowController.Config = AdaptiveWindowController.Config(),
      windowRule: WindowRule = HillClimbRule): Result = {
    val spark = docs.sparkSession
    graft.functions.ArrayIntersectSize.register(spark)

    // ---- static side (built once, like BuildSig's offline pass) ----
    val toks = SimilarityJoin.tokenize(docs, idCol, textCol).persist()
    toks.count()
    val groups = SimilarityJoin.groupTable(spark, toks, tau, alpha = 0.95)
    val index = SimilarityJoin.indexSignatures(toks, groups)
      .select(col("sig"), col("sid").as("y_id"), col("slen").as("y_len"))
      .persist()
    index.count()
    // frequency-based admission (reference P7): hot signatures never enter
    // the cache — they would evict everything else for little hit value
    val hotSigs = index.groupBy("sig").count()
      .filter(col("count") >= maxSigFrequency)
      .select("sig")
      .persist()
    hotSigs.count()
    val admit: DataFrame => DataFrame = _.join(hotSigs, Seq("sig"), "left_anti")

    val emptyCache = index.limit(0)
    val manager = new CacheManager(
      index, emptyCache, "sig", config, checkpointEvery = 4, admit = admit,
      windowRule = windowRule)

    // ---- stream side ----
    val staged = SemiStreamRuntime.stage(docs.select(idCol, textCol), idCol, chunks)
    val outDir = Files.createTempDirectory("graft-simstream-out-").toString
    val ckpt = Files.createTempDirectory("graft-simstream-ckpt-").toString

    // stored-side verify tokens: pre-partitioned by the join key and
    // persisted IN THAT LAYOUT, so every micro-batch's verify join reuses
    // the stored side's distribution and shuffles only its own candidates
    val yT = toks.select(col("sid").as("y_id"), col("toks").as("y_toks"))
      .repartition(col("y_id"))
      .persist()

    val perBatch: (Dataset[Row], Long) => Unit = { (batch, _) =>
      val bToks = SimilarityJoin.tokenize(batch.toDF(), idCol, textCol)
      val pSigs = SimilarityJoin.probeSignatures(bToks, groups, tau)
        .select(col("sig"), col("sid").as("x_id"), col("slen").as("x_len"))
      // probe-side tokens come from THIS batch (bounded), never the full
      // corpus: broadcast them into the verify join — the stored side is
      // the only big relation a batch ever shuffles against
      val xB = broadcast(bToks.select(col("sid").as("x_id"), col("toks").as("x_toks")))
      manager.processBatch(pSigs) { joined =>
        // joined = probe-sig rows ⋈ index rows on sig (hits ∪ fetched
        // misses) = the candidate pairs of this batch
        val verified = joined
          .filter(
            col("x_id") =!= col("y_id") &&
              col("y_len") >= ceil(col("x_len") * tau - 1e-4) &&
              col("y_len") <= floor(col("x_len") / tau + 1e-4))
          .select("x_id", "y_id")
          // one exchange, keyed like the persisted stored side: hash-
          // partitioning on y_id alone satisfies the pair-dedup's clustering
          // requirement (y_id ⊆ {x_id, y_id}), so the dedup aggregates
          // in-place and the verify join lines up with yT's layout instead
          // of shuffling the candidates a second time
          .repartition(col("y_id"))
          .dropDuplicates("x_id", "y_id")
          .join(xB, "x_id")
          .join(yT, "y_id")
          .withColumn(
            "inter",
            graft.functions.ArrayIntersectSize
              .intersect_size(col("x_toks"), col("y_toks")))
          .withColumn(
            "uni",
            size(col("x_toks")) + size(col("y_toks")) - col("inter"))
          .filter(col("inter").cast("double") / col("uni") >= tau)
          .select("x_id", "y_id", "inter", "uni")
        verified.write.mode("append").parquet(outDir)
      }
      ()
    }

    val query = spark.readStream
      .schema(docs.select(idCol, textCol).schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(staged.toString)
      .writeStream
      .foreachBatch(perBatch)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    query.awaitTermination()

    val stats = manager.stats.toList
    manager.close()
    toks.unpersist(); index.unpersist(); hotSigs.unpersist(); yT.unpersist()
    Result(spark.read.parquet(outDir), stats)
  }
}
