package graft

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.operators.BlockDedup

class BlockDedupSpec extends SparkSpec {
  init()

  import spark.implicits._

  test("planted duplicates: only the first occurrence survives") {
    val df = Seq(
      (1L, "a b c d e f g h i j"), // blocks: "a b c d", "e f g h", "i j"
      (2L, "a b c d x y z w"),     // first block duplicates doc 1's
      (3L, "e f g h e f g h")      // both blocks duplicate doc 1's second
    ).toDF("id", "text")
    val out = BlockDedup.dedup(df, "id", "text", blockWords = 4)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out(1L) == ((3L, 3L, "a b c d e f g h i j")))
    assert(out(2L) == ((2L, 1L, "x y z w")))
    assert(out(3L) == ((2L, 0L, "")))
  }

  test("within-document repeats collapse to the first block") {
    val df = Seq((7L, "p q p q p q")).toDF("id", "text")
    val out = BlockDedup.dedup(df, "id", "text", blockWords = 2).collect()(0)
    assert(out.getLong(1) == 3 && out.getLong(2) == 1 && out.getString(3) == "p q")
  }

  test("corpus: block totals conserved, survivors unique, text reassembly consistent") {
    val docs = Tables(spark, sfSmoke, "documents")
    val out = BlockDedup.dedup(docs, "doc_id", "text", blockWords = 8)
    val blocks = BlockDedup.blocks(docs, "doc_id", "text", 8)
    // every doc appears once; kept <= total per doc
    assert(out.count() == docs.count())
    assert(out.filter(col("n_kept") > col("n_blocks")).isEmpty)
    // Σ kept == number of DISTINCT blocks corpus-wide (each kept exactly once)
    val kept = out.agg(sum("n_kept")).collect()(0).getLong(0)
    val distinctBlocks = blocks.select("block").distinct().count()
    assert(kept == distinctBlocks, s"$kept vs $distinctBlocks")
    // reassembled text token count == 8 * full kept blocks + short-tail remainder:
    // cheap consistency — dedup_text of an untouched doc equals its normalized text
    val untouched = out.filter(col("n_kept") === col("n_blocks"))
      .join(docs, "doc_id")
      .withColumn("norm", array_join(filter(split(col("text"), " "), t => length(t) > 0), " "))
    assert(untouched.filter(col("dedup_text") =!= col("norm")).isEmpty)
  }
}
