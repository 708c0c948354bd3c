package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.Prop.forAll

import graft.operators.Winnowing

class WinnowingSpec extends SparkSpec {
  init()

  private val K = 3
  private val W = 4

  /** Pure mirror of the selection: k-shingle MD5-prefix hashes, w-window
    * minima, distinct.
    */
  private def winnowRef(tokens: Seq[String]): Set[Long] = {
    def h(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      d.take(4).foldLeft(0L)((acc, b) => (acc << 8) | (b & 0xffL))
    }
    val hs = tokens.sliding(K).map(_.mkString(" ")).map(h).toVector
    if (hs.length < W) Set.empty
    else hs.sliding(W).map(_.min).toSet
  }

  private def check(prop: Prop, minTests: Int = 200): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(minTests), prop)
    assert(res.passed, res.status.toString)
  }

  test("winnowing guarantee property: a shared run of >= w+k-1 tokens shares a fingerprint") {
    val word = Gen.choose(0, 400).map(i => s"v$i")
    val run = Gen.choose(K + W - 1, 20).flatMap(n => Gen.listOfN(n, word))
    val pad = Gen.choose(0, 12).flatMap(n => Gen.listOfN(n, word))
    val gen = for { r <- run; a <- pad; b <- pad; c <- pad; d <- pad }
      yield (a ++ r ++ b, c ++ r ++ d)
    check(forAll(gen) { case (x, y) =>
      val shared = winnowRef(x).intersect(winnowRef(y))
      Prop(shared.nonEmpty) :| s"|x|=${x.length} |y|=${y.length}"
    })
  }

  test("Spark fingerprints equal the pure mirror on sf0.001 documents") {
    import spark.implicits._
    val docs = graft.core.Tables(spark, sfSmoke, "documents")
    val got = Winnowing.fingerprints(docs, "doc_id", "text", K, W)
      .select(col("sid"), explode(col("fps")).as("fp"))
      .as[(Long, Long)].collect().groupBy(_._1).view
      .mapValues(_.map(_._2).toSet).toMap
    val expected = docs.select("doc_id", "text").as[(Long, String)].collect()
      .map { case (id, text) =>
        id -> winnowRef(text.split(" ").filter(_.nonEmpty).toSeq)
      }
      .filter(_._2.nonEmpty)
      .toMap
    assert(got == expected)
  }

  test("winnowed near-dup pairs: planted run-sharing dups found, precision exact") {
    import spark.implicits._
    val base = (1 to 30).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, base),
      (2L, base + " extra"), // long shared run, J = 30/31 ≥ 0.8
      (3L, (100 to 130).map(i => s"z$i").mkString(" "))).toDF("doc_id", "text")
    val got = Winnowing.nearDupPairs(docs, "doc_id", "text", tau = 0.8, K, W)
      .select("x_id", "y_id").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 2L)))
  }
}
