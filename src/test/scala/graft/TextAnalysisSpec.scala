package graft

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.operators.TextAnalysis

class TextAnalysisSpec extends SparkSpec {
  init()

  test("stats on a hand-computed document") {
    import spark.implicits._
    val df = Seq((1L, "the cat, the hat 99!")).toDF("doc_id", "text")
    val r = TextAnalysis.stats(df, "doc_id", "text").head()
    assert(r.getAs[Int]("n_chars") == 20)
    assert(r.getAs[Long]("n_tokens") == 5) // the cat, the hat 99!
    assert(r.getAs[Long]("n_uniq") == 4)
    // subtokens: the|cat|,|the|hat|99|! = 7
    assert(r.getAs[Long]("n_subtokens") == 7)
    // punct: ',' '!' → 2/20
    assert(r.getAs[Double]("punct_ratio") == 0.1)
    // digits: '99' → 2/20
    assert(r.getAs[Double]("digit_ratio") == 0.1)
    // stopwords(en): 'the','the' → 2/5
    assert(r.getAs[Double]("stop_ratio") == 0.4)
  }

  test("language id picks the profile with the densest stopwords") {
    import spark.implicits._
    val df = Seq(
      (1L, "the cat is on the mat and a dog"),
      (2L, "el gato es un animal y la casa que vive en"),
      (3L, "xyz qrs tuv")).toDF("doc_id", "text")
    val r = TextAnalysis.languageId(df, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(r(0).getString(1) == "en")
    assert(r(1).getString(1) == "es")
    assert(r(2).getString(1) == "de") // all-zero tie resolves to first profile
    assert(r(2).getDouble(2) == 0.0)
  }

  test("shingle fingerprints count consecutive 3-gram windows") {
    import spark.implicits._
    val df = Seq((1L, "a b c d e"), (2L, "a b")).toDF("doc_id", "text")
    val r = TextAnalysis.shingleFingerprints(df, "doc_id", "text", 3)
      .orderBy("doc_id").collect()
    assert(r(0).getAs[Long]("n_shingles") == 3) // abc bcd cde
    assert(r(0).getAs[scala.collection.Seq[Long]]("fingerprints").length == 3)
    assert(r(1).getAs[Long]("n_shingles") == 0) // shorter than w
  }

  test("repeated shingles collapse in the distinct count") {
    import spark.implicits._
    val df = Seq((1L, "a b a b a b")).toDF("doc_id", "text")
    val r = TextAnalysis.shingleFingerprints(df, "doc_id", "text", 2).head()
    assert(r.getAs[Long]("n_shingles") == 5)
    assert(r.getAs[Long]("n_distinct_shingles") == 2) // "a b", "b a"
  }

  test("quality rules on hand-computed documents") {
    import spark.implicits._
    val thirty = (1 to 30).map(i => f"word$i%02d").mkString(" ")
    val df = Seq((1L, "a b a b a"), (2L, thirty)).toDF("doc_id", "text")
    val r = TextAnalysis.qualityRules(df, "doc_id", "text").orderBy("doc_id").collect()
    // doc 1: 5 toks, top 'a'×3, 2-grams {ab,ba,ab,ba} → dup 0.5; fails
    // length (5 < 30) and word-length (avg 1.0) rules
    assert(r(0).getAs[Long]("n_tokens") == 5)
    assert(r(0).getAs[Double]("top_tok_frac") == 0.6)
    assert(r(0).getAs[Double]("dup_2gram_frac") == 0.5)
    assert(r(0).getAs[Double]("distinct_frac") == 0.4)
    assert(r(0).getAs[Int]("r_len") == 0)
    assert(r(0).getAs[Int]("r_wlen") == 0)
    assert(r(0).getAs[Int]("r_div") == 1)
    assert(r(0).getAs[Int]("r_rep") == 1)
    assert(r(0).getAs[Int]("pass") == 0)
    // doc 2: 30 distinct 6-char words → every rule passes
    assert(r(1).getAs[Long]("n_tokens") == 30)
    assert(r(1).getAs[Double]("distinct_frac") == 1.0)
    assert(r(1).getAs[Double]("dup_2gram_frac") == 0.0)
    assert(r(1).getAs[Int]("pass") == 1)
  }

  test("ngram novelty separates shared from unique grams") {
    import spark.implicits._
    val df = Seq(
      (1L, "x y z w"), // grams: "x y z", "y z w"
      (2L, "x y z q"), // grams: "x y z", "y z q"
      (3L, "a b")) // too short — absent from output
      .toDF("doc_id", "text")
    val r = TextAnalysis.ngramNovelty(df, "doc_id", "text", 3).orderBy("doc_id").collect()
    assert(r.length == 2)
    assert(r(0).getAs[Long]("n_grams") == 2)
    assert(r(0).getAs[Double]("novel_frac") == 0.5) // "y z w" unique, "x y z" shared
    assert(r(0).getAs[Long]("max_df") == 2)
    assert(r(1).getAs[Double]("novel_frac") == 0.5)
  }

  test("pii redaction: sequential count-then-mask on hand-built documents") {
    import spark.implicits._
    val df = Seq(
      (1L, "mail a.b@x.io or c@y.org call 555-123-4567 from 10.0.0.1"),
      (2L, "no pii here at all"),
      // phone-shaped digits INSIDE an email: attributed to email only
      (3L, "v 555-123-4567@mail.com"),
      (4L, "ips 1.2.3.4 10.20.30.40 and 999.999.999.999")).toDF("doc_id", "text")
    val r = TextAnalysis.redactPii(df, "doc_id", "text").orderBy("doc_id").collect()
    assert(r(0).getAs[Long]("n_email") == 2)
    assert(r(0).getAs[Long]("n_phone") == 1)
    assert(r(0).getAs[Long]("n_ip") == 1)
    assert(r(0).getAs[String]("clean_text") ==
      "mail <EMAIL> or <EMAIL> call <PHONE> from <IP>")
    assert(r(1).getAs[Long]("n_email") + r(1).getAs[Long]("n_phone") +
      r(1).getAs[Long]("n_ip") == 0)
    assert(r(1).getAs[String]("clean_text") == "no pii here at all")
    assert(r(2).getAs[Long]("n_email") == 1 && r(2).getAs[Long]("n_phone") == 0)
    assert(r(3).getAs[Long]("n_ip") == 3) // {1,3}-octets: 999.⋯ matches too (documented)
    // masked text never re-matches any pattern
    val again = TextAnalysis.redactPii(
      TextAnalysis.redactPii(df, "doc_id", "text")
        .select(col("doc_id"), col("clean_text").as("text")),
      "doc_id", "text")
    assert(again.filter(col("n_email") + col("n_phone") + col("n_ip") > 0).count() == 0)
  }

  test("stats run over the documents table without nulls") {
    val docs = Tables(spark, sfSmoke, "documents")
    val s = TextAnalysis.stats(docs, "doc_id", "text")
    assert(s.count() == docs.count())
    val nullCount = s.select(
      s.columns.map(c => sum(when(col(c).isNull, 1).otherwise(0)).as(c)): _*)
      .collect()(0).toSeq.map(_.asInstanceOf[Long]).sum
    assert(nullCount == 0)
  }
}
