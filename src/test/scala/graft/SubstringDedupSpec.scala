package graft

import graft.operators.SubstringDedup

/** Repeated-span detection vs a brute-force shingle oracle: island
  * merging, span boundaries, minCount gating, and the per-doc load
  * rollup.
  */
class SubstringDedupSpec extends SparkSpec {
  init()
  import spark.implicits._

  private def brute(
      docs: Seq[(Long, String)],
      k: Int,
      minCount: Int): Seq[(Long, Long, Long, Long)] = {
    val sh = docs.flatMap { case (id, text) =>
      val ts = text.split(" ").filter(_.nonEmpty)
      (0 to ts.length - k).map(i => (id, i.toLong, ts.slice(i, i + k).mkString(" ")))
    }
    val occ = sh.groupBy(_._3).view.mapValues(_.size).toMap
    val rep = sh.filter(s => occ(s._3) >= minCount)
    rep.groupBy(_._1).toSeq.flatMap { case (id, ss) =>
      val ps = ss.map(_._2).sorted
      // islands of consecutive positions
      val groups = ps.foldLeft(Vector.empty[Vector[Long]]) { (acc, p) =>
        if (acc.nonEmpty && acc.last.last == p - 1) acc.init :+ (acc.last :+ p)
        else acc :+ Vector(p)
      }
      groups.map(g => (id, g.head, g.last + k - 1, g.size.toLong))
    }.sortBy(t => (t._1, t._2))
  }

  test("spans equal brute force on a templated corpus") {
    // "LICENSE header common text" repeats in 3 docs; unique tails differ
    val tpl = "this document is licensed under the common license header"
    val docs = Seq(
      (1L, s"$tpl alpha beta gamma"),
      (2L, s"prefix words here $tpl delta epsilon"),
      (3L, s"$tpl"),
      (4L, "a wholly unique document with no repeats at all"),
      (5L, "short one"))
    for (k <- Seq(3, 5); minCount <- Seq(2, 3)) {
      val got = SubstringDedup
        .repeatedSpans(docs.toDF("doc_id", "text"), "doc_id", "text", k, minCount)
        .orderBy("doc_id", "start_tok")
        .as[(Long, Long, Long, Long)].collect().toSeq
      val want = brute(docs, k, minCount)
      assert(got == want, s"k=$k minCount=$minCount: got $got want $want")
      assert(want.nonEmpty, s"k=$k minCount=$minCount fixture found nothing")
    }
  }

  test("adjacent repeated shingles merge into one maximal span") {
    // doc 1 and 2 share a 7-token run; with k=3 that is 5 consecutive
    // repeated shingle starts — ONE span, not five
    val run = "one two three four five six seven"
    val docs = Seq((1L, s"$run tail1"), (2L, s"head $run"))
    val got = SubstringDedup
      .repeatedSpans(docs.toDF("doc_id", "text"), "doc_id", "text", k = 3, minCount = 2)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 0L, 6L, 5L), (2L, 1L, 7L, 5L)))
  }

  test("overlapping islands merge: a one-start gap must not double-count tokens") {
    // doc 1 repeats "a b c" (of doc 2) and "c d e" (of doc 3) around a
    // non-repeated middle: with k=3 the islands are starts {0} and {2},
    // token ranges [0,2] and [2,4] — OVERLAPPING at token 2. Coverage
    // must be 5 tokens, not 6.
    val docs = Seq(
      (1L, "a b c d e"),
      (2L, "x a b c y"),
      (3L, "p c d e q"))
    val merged = SubstringDedup
      .mergedSpans(docs.toDF("doc_id", "text"), "doc_id", "text", k = 3, minCount = 2)
      .filter($"doc_id" === 1L)
      .as[(Long, Long, Long)].collect().toSeq
    assert(merged == Seq((1L, 0L, 4L)), s"islands did not merge: $merged")
    val load = SubstringDedup
      .duplicationLoad(docs.toDF("doc_id", "text"), "doc_id", "text", k = 3, minCount = 2)
      .filter($"doc_id" === 1L)
      .as[(Long, Long, Long, Long)].collect().head
    assert(load == ((1L, 5L, 5L, 10000L)), s"coverage double-counted: $load")
  }

  test("removeRepeatedSpans keeps the global-first occurrence and excises the rest") {
    val tpl = "t1 t2 t3 t4 t5 t6"
    val docs = Seq(
      (1L, s"$tpl alpha"), // canonical (min doc_id): keeps the template
      (2L, s"beta $tpl gamma"), // template excised
      (3L, tpl)) // fully templated → empty
    val got = SubstringDedup
      .removeRepeatedSpans(docs.toDF("doc_id", "text"), "doc_id", "text", k = 3, minCount = 2)
      .orderBy("doc_id")
      .as[(Long, String)].collect().toSeq
    assert(got == Seq((1L, s"$tpl alpha"), (2L, "beta gamma"), (3L, "")))
  }

  test("duplicationLoad covers every doc with exact bp shares") {
    val run = "one two three four five six seven"
    val docs = Seq((1L, s"$run tail1"), (2L, s"head $run"), (3L, "no repeats here"))
    val got = SubstringDedup
      .duplicationLoad(docs.toDF("doc_id", "text"), "doc_id", "text", k = 3, minCount = 2)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long)].collect().toSeq
    // docs 1,2: 7 of 8 tokens covered → 8750 bp; doc 3: zero
    assert(got == Seq((1L, 8L, 7L, 8750L), (2L, 8L, 7L, 8750L), (3L, 3L, 0L, 0L)))
  }
}
