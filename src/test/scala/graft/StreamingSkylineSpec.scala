package graft

import org.apache.spark.sql.functions._

import graft.operators.{Sampling, Skyline}
import graft.streaming.StreamingSkyline

class StreamingSkylineSpec extends SparkSpec {
  init()

  import spark.implicits._

  test("every batch tick equals the batch front over its arrival prefix") {
    val docs = graft.core.Tables(spark, sfSmoke, "documents")
    val tk = filter(split(col("text"), " "), x => length(x) > 0)
    val crit = docs.select(col("doc_id"), tk.as("__t"))
      .select(
        col("doc_id"),
        size(col("__t")).cast("long").as("a"),
        size(array_distinct(col("__t"))).cast("long").as("b"))
      .persist()
    val out = StreamingSkyline.run(crit, "doc_id", Seq("a", "b"), chunks = 3)
    val got = out.select("batch", "a", "b").as[(Long, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(r => (r._2, r._3)).toSet).toMap
    assert(got.keySet == Set(0L, 1L, 2L))
    val chunked = crit
      .withColumn("ck", floor(Sampling.hashUniform(col("doc_id")) * 3).cast("int"))
      .persist()
    (0 to 2).foreach { b =>
      val prefix = chunked.filter(col("ck") <= b)
      val expect = Skyline.paretoFront(prefix, "doc_id", Seq("a", "b"))
        .select("a", "b").as[(Long, Long)].collect().toSet
      assert(got(b.toLong) == expect, s"batch $b")
    }
    crit.unpersist(); chunked.unpersist()
    ()
  }

  test("crash-resume: kill at batch 2, restart on the same root, outputs identical") {
    // the durable state is the per-batch output partition itself: a fresh
    // process rebuilds its prior front from partition b-1 (scaladoc
    // contract). Run A is killed by the injected failure before batch 2
    // processes; run B resumes from the same root and checkpoint.
    val pts = (1L to 80L).map(i => (i, (i * 13) % 17, (i * 5) % 19)).toDF("id", "x", "y")
      .select(col("id"), col("x").cast("long").as("x"), col("y").cast("long").as("y"))
    val root = java.nio.file.Files.createTempDirectory("graft-skyresume-").toString
    val died = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      StreamingSkyline.run(pts, "id", Seq("x", "y"), chunks = 4,
        resumeRoot = Some(root), failAtBatch = Some(2L))
    }
    assert(died.getMessage.contains("injected failure"))
    val resumed = StreamingSkyline.run(pts, "id", Seq("x", "y"), chunks = 4,
        resumeRoot = Some(root))
      .select("batch", "x", "y").as[(Long, Long, Long)].collect().toSet
    val clean = StreamingSkyline.run(pts, "id", Seq("x", "y"), chunks = 4)
      .select("batch", "x", "y").as[(Long, Long, Long)].collect().toSet
    assert(resumed == clean)
    assert(resumed.map(_._1) == Set(0L, 1L, 2L, 3L))
  }

  test("the online-skyline law: a dominated vector never re-enters a later front") {
    // batch order is md5-derived; whatever it is, front sizes per batch
    // are monotone in COVERAGE of the prefix: any vector on batch b's
    // front that is absent from batch b+1's front must be dominated by
    // some b+1 front member
    val pts = (1L to 60L).map(i => (i, i % 9, (i * 7) % 11)).toDF("id", "x", "y")
      .select(col("id"), col("x").cast("long").as("x"), col("y").cast("long").as("y"))
    val out = StreamingSkyline.run(pts, "id", Seq("x", "y"), chunks = 3)
      .select("batch", "x", "y").as[(Long, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(r => (r._2, r._3)).toSet).toMap
    (0 to 1).foreach { b =>
      val dropped = out(b.toLong) -- out(b.toLong + 1)
      dropped.foreach { case (x, y) =>
        assert(
          out(b.toLong + 1).exists { case (x2, y2) =>
            x2 >= x && y2 >= y && (x2 > x || y2 > y)
          },
          s"($x,$y) left the front without a dominator")
      }
    }
  }
}
