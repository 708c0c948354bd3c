package graft

import org.apache.spark.sql.functions._

import graft.functions.WordPieceEncode
import graft.operators.TextClassifier

/** WordPiece greedy segmentation (native expression) and the hashed-gram
  * linear classifier.
  */
class WordPieceSpec extends SparkSpec {
  init()

  private val starts = graft.queries.DocumentQueries.wpStarts
  private val conts = graft.queries.DocumentQueries.wpConts

  private def enc(words: String*): Seq[String] = {
    import spark.implicits._
    WordPieceEncode.register(spark)
    Seq(Tuple1(words)).toDF("w")
      .select(WordPieceEncode.wordpiece_encode(col("w"), starts, conts).as("p"))
      .as[Seq[String]].head()
  }

  test("wordpiece: greedy longest-match picks the longest piece at each step") {
    assert(enc("window") == Seq("wind", "##ow")) // not w,##i,##n,…
    assert(enc("scan") == Seq("sca", "##n"))
    assert(enc("merge") == Seq("me", "##rge"))
    assert(enc("filter") == Seq("fil", "##t", "##e", "##r"))
    assert(enc("a") == Seq("a"))
  }

  test("wordpiece: whole-word [UNK] on any failed position, with rollback") {
    assert(enc("data") == Seq("[UNK]")) // no 'd…' start piece
    assert(enc("spark") == Seq("[UNK]")) // '##p' missing mid-word
    // 'group' emits gro,##u then fails on 'p' — emitted pieces roll back
    assert(enc("group") == Seq("[UNK]"))
    // surrounding words are unaffected by a failure in the middle
    assert(enc("scan", "group", "window") ==
      Seq("sca", "##n", "[UNK]", "wind", "##ow"))
  }

  test("wordpiece: SQL surface takes literal array vocab") {
    WordPieceEncode.register(spark)
    val got = spark.sql(
      "SELECT wordpiece_encode(array('window','data'), " +
        "array('wind','w'), array('ow','i','n','d')) AS p")
      .head().getSeq[String](0)
    assert(got == Seq("wind", "##ow", "[UNK]"))
  }

  test("wordpiece: non-literal vocab is rejected with a clear error") {
    WordPieceEncode.register(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT wordpiece_encode(array('a'), array(CAST(rand() AS STRING)), array('b'))")
        .collect()
    }
    assert(e.getMessage.contains("literal"), e.getMessage)
  }

  test("classifier: scores are exact weight sums, argmax ties to the smaller class") {
    import spark.implicits._
    graft.functions.JavaStringHash.register(spark)
    // hand-check: "ab" hashes to 97*31+98 = 3105 → bucket 33 (mod 256)
    val w = TextClassifier.fixtureWeights(4, 256)
    val expected = (0 until 4).map(c => 2L * w(33 * 4 + c))
    val best = expected.max
    val label = expected.indexOf(best).toLong
    val got = TextClassifier.classifyHashedLinear(
        Seq((1L, "ab ab")).toDF("id", "text"), "id", "text", 4, 256, w)
      .as[(Long, Long, Long)].head()
    assert(got == ((1L, label, best)), s"got $got expected ($label, $best)")
  }

  test("classifier: empty text → class 0 with score 0; tie → smaller class") {
    import spark.implicits._
    graft.functions.JavaStringHash.register(spark)
    val e = TextClassifier.classifyHashedLinear(
        Seq((1L, "   ")).toDF("id", "text"), "id", "text", 4, 256,
        TextClassifier.fixtureWeights(4, 256))
      .as[(Long, Long, Long)].head()
    assert(e == ((1L, 0L, 0L)))
    // all-equal weights: every class ties, label must be 0
    val tie = TextClassifier.classifyHashedLinear(
        Seq((1L, "x y z")).toDF("id", "text"), "id", "text", 2, 1, Seq(5L, 5L))
      .as[(Long, Long, Long)].head()
    assert(tie == ((1L, 0L, 15L)))
  }

  test("classifier: scan-level projection — no shuffle in the plan") {
    graft.functions.JavaStringHash.register(spark)
    val out = TextClassifier.classifyHashedLinear(
      graft.core.Tables(spark, sfSmoke, "documents"), "doc_id", "text",
      4, 256, TextClassifier.fixtureWeights(4, 256))
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }
}
