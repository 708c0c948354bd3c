package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types.{LongType, StringType, StructType}

import graft.streaming.{DedupStateStore, TransactionLogDedupState}

/** Round-15 hardening of [[TransactionLogDedupState]] (r14 verdict task 2 +
  * ADVICE): log CHECKPOINTS bound cold-start replay, the cached snapshot
  * bounds warm-path log parsing, and the pb stats domain is GUARDED instead
  * of silently mis-skipping out-of-domain buckets.
  */
class TransactionLogCheckpointSpec extends SparkSpec {
  init()

  private val dataSchema = new StructType().add("k", StringType).add("v", LongType)

  private def freshDir(): String =
    java.nio.file.Files.createTempDirectory("graft-txnckpt-").toString + "/s"

  private def mk(dir: String): DedupStateStore =
    TransactionLogDedupState.factory(spark, dir, dataSchema, Seq("k"))

  private def rows(prefix: String, n: Int, pb: Int = 0): DataFrame = {
    import spark.implicits._
    (1 to n).map(i => (s"$prefix$i", i.toLong, pb)).toDF("k", "v", "pb")
  }

  private def keys(df: DataFrame): Seq[String] =
    df.select("k").collect().map(_.getString(0)).toSeq.sorted

  private def logFiles(dir: String, ext: String): Seq[String] = {
    val f = new java.io.File(dir, "_log").listFiles()
    if (f == null) Seq.empty
    else f.map(_.getName).filter(_.endsWith(ext)).toSeq.sorted
  }

  test("a long log writes checkpoints, and a COLD instance resumes from the newest one") {
    val dir = freshDir(); val st = mk(dir)
    // 12 append commits + 1 compaction commit > checkpointEvery (8)
    (0 until 12).foreach(b => st.append(rows(s"b$b-", 2, pb = b % 3), b.toLong))
    st.compact(10L)
    assert(logFiles(dir, ".ckpt").nonEmpty, "no checkpoint written after > 8 commits")
    // retention: commits covered by the newest checkpoint are deleted, so
    // the _log listing stays O(checkpointEvery) instead of O(commits)
    val ckptV = logFiles(dir, ".ckpt").last.stripSuffix(".ckpt").toLong
    val commitVs = logFiles(dir, ".json").map(_.stripSuffix(".json").toLong)
    assert(commitVs.forall(_ > ckptV),
      s"covered commits survived truncation: $commitVs vs ckpt $ckptV")
    val expected = keys(st.read(100L, Seq(0, 1, 2)))
    assert(expected.size == 24) // 12 batches × 2 keys, exactly once each

    // a FRESH instance over the same dir (driver restart): must seed from
    // the checkpoint + trailing commits and see identical state
    val cold = mk(dir)
    assert(keys(cold.read(100L, Seq(0, 1, 2))) == expected)
    // and bucket pruning still works through the checkpointed stats
    assert(keys(cold.read(100L, Seq(1))) == expected.filter { k =>
      val b = k.drop(1).takeWhile(_ != '-').toInt; b % 3 == 1
    })
  }

  test("checkpoint tombstones are pruned to pending-vacuum files only") {
    val dir = freshDir(); val st = mk(dir)
    (0 until 8).foreach(b => st.append(rows(s"b$b-", 2), b.toLong))
    st.compact(8L) // tombstones + vacuums the 8 increments, then ckpt at v9? no —
    // commit 9 is the compaction; force one more commit past the boundary
    (8 until 16).foreach(b => st.append(rows(s"b$b-", 2), b.toLong))
    val ckpts = logFiles(dir, ".ckpt")
    assert(ckpts.nonEmpty)
    // the newest checkpoint must not carry vacuumed tombstones: every file
    // it names still exists on disk
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = mapper.readTree(new java.io.File(s"$dir/_log/${ckpts.last}"))
    import scala.jdk.CollectionConverters._
    val named = (node.get("live").elements().asScala ++
      node.get("tombstoned").elements().asScala).map(_.get("file").asText()).toSeq
    named.foreach { f =>
      assert(new java.io.File(s"$dir/data/$f").exists(), s"checkpoint names vacuumed file $f")
    }
  }

  test("an out-of-domain pb fails the append LOUDLY instead of corrupting file stats") {
    import spark.implicits._
    val dir = freshDir(); val st = mk(dir)
    val bad = Seq(("k1", 1L, 5000)).toDF("k", "v", "pb") // pb ≥ 4096
    val e = intercept[Exception] { st.append(bad, 0L) }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq.empty else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("stats domain")), s"unexpected failure: $e")
    // nothing was committed: the store is still empty
    assert(keys(st.read(10L, Seq(0))).isEmpty)
  }

  test("leftover covered commits (crash between checkpoint and truncation) are harmless") {
    val dir = freshDir(); val st = mk(dir)
    (0 until 10).foreach(b => st.append(rows(s"b$b-", 2, pb = b % 2), b.toLong))
    val expected = keys(st.read(100L, Seq(0, 1)))
    // resurrect a covered commit alongside the checkpoint — exactly the
    // state a crash between writeCheckpoint's move and its retention
    // deletes leaves behind: the replay must SKIP commits ≤ the checkpoint
    // version, not double-apply them
    val ckptV = logFiles(dir, ".ckpt").last.stripSuffix(".ckpt").toLong
    assert(ckptV >= 1L)
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val fake = mapper.createObjectNode()
    fake.put("batch", 0L)
    fake.putArray("adds"); fake.putArray("removes"); fake.putArray("folded")
    // a duplicate of commit 1's slot: version 1 ≤ ckptV, content irrelevant
    // (it must never be read) — but give it batch 0 with NO adds so a
    // wrongly-applied replay would supersede batch 0's files and corrupt
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "_log", f"${1L}%012d.json"),
      mapper.writeValueAsBytes(fake))
    val cold = mk(dir)
    assert(keys(cold.read(100L, Seq(0, 1))) == expected,
      "cold resume applied a checkpoint-covered commit")
  }

  test("commits carry footer-derived row stats (telemetry without a count job)") {
    val dir = freshDir(); val st = mk(dir)
    st.append(rows("a", 5, pb = 1), 0L)
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val commit = logFiles(dir, ".json").head
    val node = mapper.readTree(new java.io.File(s"$dir/_log/$commit"))
    import scala.jdk.CollectionConverters._
    val rowsStat = node.get("adds").elements().asScala.map(_.get("rows").asLong()).sum
    assert(rowsStat == 5L, s"expected 5 rows in commit stats, got $rowsStat")
  }
}
