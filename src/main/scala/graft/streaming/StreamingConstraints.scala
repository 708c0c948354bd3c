package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}

/** Data-quality monitoring ON INGEST — the streaming face of
  * [[graft.operators.Constraints]]: every micro-batch reports its
  * constraint metrics in exact basis points, plus the one metric a
  * batch alone cannot know — CUMULATIVE key uniqueness — carried as
  * keyed first-seen state. The deployment shape is the Deequ paper's
  * "metrics repository over time": a pipeline alarms on the batch where
  * completeness dips or duplicate-key rate jumps, without ever
  * rescanning history.
  *
  * One stateful pass: row-grain check flags are computed scan-side
  * (pure projection), the keyed fold emits per-(key, batch) partial
  * counts plus a first-seen bit, and per-batch metrics are a bounded
  * rollup (≤ batches × checks rows). State per key is ONE boolean —
  * strictly smaller than any dedup state; everything else is
  * change-volume-proportional.
  *
  * Output: (batch, check, metric_bp, threshold_bp, pass) — one row per
  * check per batch; `cumulative_unique` is distinct-keys-so-far over
  * rows-so-far.
  */
object StreamingConstraints {

  final case class Chg(key: Long, seq: Long, chunk: Int, flags: Seq[Boolean])
  final case class Stat(batch: Int, n: Long, flagCounts: Seq[Long], newKeys: Long)

  private[streaming] def fold(
      key: Long,
      chgs: Iterator[Chg],
      state: GroupState[Boolean]): Iterator[Stat] = {
    val rows = chgs.toSeq
    val batch = rows.map(_.chunk).max
    val k = rows.head.flags.size
    val counts = (0 until k).map(i => rows.count(_.flags(i)).toLong)
    val seen = state.getOption.getOrElse(false)
    if (!seen) state.update(true)
    Iterator(Stat(batch, rows.size.toLong, counts, if (seen) 0L else 1L))
  }

  /** `flagChecks` maps check names to row-grain boolean columns over
    * `changes`' schema; `minBp` maps every check (including
    * "cumulative_unique") to its pass threshold in basis points.
    */
  def run(
      changes: DataFrame,
      keyCol: String,
      seqCol: String,
      flagChecks: Seq[(String, Column)],
      minBp: Map[String, Long],
      chunks: Int): DataFrame = {
    val spark = changes.sparkSession
    import spark.implicits._
    require(chunks > 0)
    require(flagChecks.nonEmpty, "at least one flag check")
    require(
      (flagChecks.map(_._1) :+ "cumulative_unique").forall(minBp.contains),
      s"minBp must cover every check: ${minBp.keySet}")
    val bounds = changes
      .agg(min(col(seqCol).cast("long")), max(col(seqCol).cast("long"))).head()
    require(!bounds.isNullAt(0), "empty stream")
    val (lo, hi) = (bounds.getLong(0), bounds.getLong(1))
    val per = (hi - lo) / chunks + 1
    val projected = changes.select(
      col(keyCol).cast("long").as("key"),
      col(seqCol).cast("long").as("seq"),
      least(expr(s"(CAST($seqCol AS LONG) - ${lo}L) div ${per}L"), lit(chunks - 1L))
        .cast("int").as("chunk"),
      // NULL-producing predicates (e.g. `col < 2500` on a NULL input) must
      // FAIL the check, matching batch Constraints semantics — and a NULL
      // array element would blow up the Seq[Boolean] encoder at runtime
      array(flagChecks.map(fc => coalesce(fc._2.cast("boolean"), lit(false))): _*)
        .as("flags"))
    val staged = SemiStreamRuntime.stageByColumn(
      projected.withColumn("__chunk", col("chunk")), "__chunk", chunks)

    val name = s"sconstr_${System.nanoTime()}"
    val ckpt = java.nio.file.Files.createTempDirectory("graft-sconstr-ckpt-").toString
    // state-sized shuffle partitions for the keyed-state exchange (see
    // SemiStreamRuntime.stateSession): the memory sink registers in the
    // clone, so every read of the result table goes through `sess`
    val sess = SemiStreamRuntime.stateSession(spark)
    val stream = sess.readStream
      .schema(projected.schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(staged.toString)
    val q = stream.as[Chg]
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(fold)
      .toDF()
      .writeStream
      .outputMode(OutputMode.Append())
      .format("memory")
      .queryName(name)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    // bounded rollup: ≤ batches rows in, ≤ batches × checks rows out
    val aggCols = (sum("n").as("n") +:
      flagChecks.indices.map(i => sum(expr(s"flagCounts[$i]")).as(s"__c$i"))) :+
      sum("newKeys").as("__new")
    val perBatch = sess.table(name)
      .groupBy("batch")
      .agg(aggCols.head, aggCols.tail: _*)
    // cumulative sums via a triangular self-join over the ≤ `chunks`-row
    // batch relation — no unpartitioned window anywhere (the round-11
    // WindowExec hygiene), ≤ chunks² joined pairs by construction
    val lhs = perBatch.select(col("batch")).alias("l")
    val rhs = perBatch.select(
      col("batch").as("__b2"), col("n").as("__n2"), col("__new").as("__new2"))
      .alias("r")
    val cumRel = lhs
      .join(rhs, col("r.__b2") <= col("l.batch"))
      .groupBy(col("l.batch").as("batch"))
      .agg(sum("__n2").as("__cumN"), sum("__new2").as("__cumD"))
    val cum = perBatch.join(cumRel, "batch")
    val flagRows = flagChecks.zipWithIndex.map { case ((nm, _), i) =>
      cum.select(
        col("batch"),
        lit(nm).as("check"),
        expr(s"__c$i * 10000 div n").as("metric_bp"),
        lit(minBp(nm)).as("threshold_bp"),
        expr(s"__c$i * 10000 div n >= ${minBp(nm)}L").as("pass"))
    }
    val uniqRow = cum.select(
      col("batch"),
      lit("cumulative_unique").as("check"),
      expr("__cumD * 10000 div __cumN").as("metric_bp"),
      lit(minBp("cumulative_unique")).as("threshold_bp"),
      expr(s"__cumD * 10000 div __cumN >= ${minBp("cumulative_unique")}L").as("pass"))
    (flagRows :+ uniqRow).reduce(_ unionByName _)
  }

  /** LIVE-stream face: per-micro-batch constraint verdicts over ANY
    * streaming DataFrame (rate source in tests; socket/Kafka in
    * production — source-agnostic like the rest of the
    * [[SemiStreamRuntime]] consumers). Each batch runs the same
    * single-aggregation scan-check pass batch
    * [[graft.operators.Constraints]] compiles to, inside `foreachBatch`,
    * and appends one verdict row per check: (batch, check, metric_bp,
    * threshold_bp, pass), exact basis points, NULL-failing flags. Runs
    * until `batches` non-empty micro-batches have reported (then stops
    * the query) or `timeoutMs` elapses. Cumulative uniqueness is
    * deliberately absent here — that metric needs keyed state and lives
    * on the staged [[run]] path; this face is the stateless per-batch
    * alarm surface a deployment points at ingest.
    */
  def runLive(
      stream: DataFrame,
      flagChecks: Seq[(String, Column)],
      minBp: Map[String, Long],
      batches: Int,
      timeoutMs: Long = 60000L): DataFrame = {
    val spark = stream.sparkSession
    require(batches >= 1)
    require(flagChecks.nonEmpty, "at least one flag check")
    require(
      flagChecks.map(_._1).forall(minBp.contains),
      s"minBp must cover every check: ${minBp.keySet}")
    val verdicts =
      new java.util.concurrent.ConcurrentLinkedQueue[(Long, String, Long, Long, Boolean)]()
    val seen = new java.util.concurrent.atomic.AtomicLong(0L)
    val ckpt = java.nio.file.Files.createTempDirectory("graft-sconstr-live-").toString
    val flagged = stream.select(
      flagChecks.map(fc =>
        coalesce(fc._2.cast("boolean"), lit(false)).cast("long").as(s"__f_${fc._1}")): _*)
    val q = flagged.writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", ckpt)
      .foreachBatch { (df: DataFrame, batchId: Long) =>
        val aggs = count(lit(1)).as("__n") +:
          flagChecks.map(fc => sum(col(s"__f_${fc._1}")).as(s"__c_${fc._1}"))
        val row = df.agg(aggs.head, aggs.tail: _*).head()
        val n = row.getLong(0)
        if (n > 0) {
          flagChecks.zipWithIndex.foreach { case ((nm, _), i) =>
            val bp = row.getLong(i + 1) * 10000L / n
            verdicts.add((batchId, nm, bp, minBp(nm), bp >= minBp(nm)))
          }
          seen.incrementAndGet()
          ()
        }
      }
      .start()
    try {
      val deadline = System.nanoTime() + timeoutMs * 1000000L
      while (seen.get() < batches && System.nanoTime() < deadline)
        Thread.sleep(50)
    } finally {
      q.stop()
      q.awaitTermination()
    }
    import spark.implicits._
    import scala.jdk.CollectionConverters._
    val rows: Seq[(Long, String, Long, Long, Boolean)] = verdicts.asScala.toSeq
    rows.toDF("batch", "check", "metric_bp", "threshold_bp", "pass")
  }
}
