package graft

import org.apache.spark.sql.functions.col

import graft.operators.Readability

class ReadabilitySpec extends SparkSpec {
  init()
  import spark.implicits._

  private def run(texts: Seq[(Long, String)])
      : Map[Long, (Long, Long, Long, Option[Long], String)] =
    Readability.flesch(texts.toDF("doc_id", "text"), "doc_id", "text")
      .as[(Long, Long, Long, Long, Option[Long], String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap

  test("hand-counted sentence: words, sentences, vowel runs, the milli formula") {
    // "the cat sat on a mat." -> 6 words, 1 sentence, runs: e,a,a,o,a,a = 6
    val got = run(Seq(1L -> "the cat sat on a mat."))(1L)
    assert(got._1 == 6L && got._2 == 1L && got._3 == 6L)
    val expected = 206835L - (1015L * 6) / 1 - (84600L * 6) / 6
    assert(got._4.contains(expected) && expected == 116145L)
    assert(got._5 == "very_easy")
  }

  test("all-consonant tokens still cost one syllable each (words floor)") {
    // 3 words, ZERO vowel runs -> syllables = max(3, 0) = 3
    val got = run(Seq(1L -> "tsk brr hmm!"))(1L)
    assert(got._1 == 3L && got._3 == 3L)
  }

  test("long clinical prose lands in a harder band than simple prose") {
    val simple = Seq.fill(20)("the dog ran.").mkString(" ")
    val clinical = Seq.fill(10)(
      "institutional pharmacokinetic contraindication necessitates comprehensive reevaluation").mkString(". ") + "."
    val got = run(Seq(1L -> simple, 2L -> clinical))
    assert(got(1L)._4.get > got(2L)._4.get)
    assert(got(1L)._5 == "very_easy")
    assert(Seq("hard", "very_hard").contains(got(2L)._5))
  }

  test("empty and whitespace-only texts report NULL score and the empty band") {
    val got = run(Seq(1L -> "", 2L -> "   "))
    assert(got(1L) == ((0L, 1L, 0L, None, "empty")))
    assert(got(2L) == ((0L, 1L, 0L, None, "empty")))
  }

  test("flesch TVF round-trips the Scala path on real documents") {
    spark.read.parquet(s"$sfSmoke/documents.parquet")
      .createOrReplaceTempView("read_docs")
    val sqlDf = spark.sql("SELECT * FROM flesch('read_docs', 'doc_id', 'text')")
    val scalaDf = Readability.flesch(spark.table("read_docs"), "doc_id", "text")
    assert(sqlDf.columns.toSeq == scalaDf.columns.toSeq)
    assert(sqlDf.exceptAll(scalaDf).isEmpty && scalaDf.exceptAll(sqlDf).isEmpty)
    // bands cover the documented thresholds on real data without NULL leaks
    assert(scalaDf.filter(col("flesch_milli").isNull === (col("band") =!= "empty"))
      .count() == 0)
  }
}
