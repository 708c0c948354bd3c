package graft

import org.apache.spark.sql.functions._

import graft.operators.BpeTrain

/** BPE training on the Sennrich et al. example corpus where every merge
  * round is hand-computable, plus the documented two-pass-replace
  * semantics on same-symbol runs and encode consistency.
  */
class BpeTrainSpec extends SparkSpec {
  init()
  import spark.implicits._

  // word counts: low:5 lower:2 newest:6 widest:3
  private val corpus = Seq(
    (1L, "low low low low low"),
    (2L, "lower lower"),
    (3L, "newest newest newest newest newest newest"),
    (4L, "widest widest widest"))

  test("learned merges match the hand-computed rounds (with tie-breaks)") {
    val got = BpeTrain.learn(corpus.toDF("doc_id", "text"), "text", nMerges = 6)
      .map(m => (m.step, m.lhs, m.rhs, m.pair_cnt, m.corpus_symbols))
    // Round-by-round argmax with (cnt desc, lhs, rhs) tie-break:
    //   (e,s)=9 ties (s,t),(t,</w>) → 'e' wins; then (es,t)=9 beats
    //   (t,</w>) on lhs; then (est,</w>)=9; (l,o)=7 ties (o,w); (lo,w)=7;
    //   (e,w)=6 ties (n,e),(w,est</w>). Initial corpus symbols
    //   20+12+42+21=95; no merge overlaps here, so each round shrinks by
    //   exactly its pair count.
    val expected = Seq(
      (1, "e", "s", 9L, 86L),
      (2, "es", "t", 9L, 77L),
      (3, "est", "</w>", 9L, 68L),
      (4, "l", "o", 7L, 61L),
      (5, "lo", "w", 7L, 54L),
      (6, "e", "w", 6L, 48L))
    assert(got == expected, s"got $got")
  }

  test("two-pass replace semantics on same-symbol runs (documented case)") {
    // ' a a a a a </w> ' under merge (a,a): pass 1 merges pairs 1 and 3
    // (the shared delimiter skips pair 2), pass 2 finds nothing further →
    // [aa, a, aa, </w>] — same multiset as strict LTR pairing, positions
    // differ; what matters is that it is deterministic and replayable by
    // any engine's replace().
    val out = Seq("aaaaa").toDF("w")
      .select(BpeTrain.applyMerge(BpeTrain.spacedSymbols(col("w")), "a", "a").as("s"))
      .as[String].head()
    assert(out == " aa a aa </w> ", s"got '$out'")
  }

  test("encode applies merges in learned order; empty docs report zeros") {
    val merges = BpeTrain.learn(corpus.toDF("doc_id", "text"), "text", nMerges = 6)
    val docs = Seq((1L, "low lower"), (2L, "newest"), (3L, "")).toDF("doc_id", "text")
    val got = BpeTrain.encode(docs, "doc_id", "text", merges)
      .orderBy("doc_id").as[(Long, Long, Long)].collect().toSeq
    // low → [low, </w>] (2); lower → [low, e, r, </w>] (4);
    // newest → n e w e s t</w> after es,est,est</w>,ew: [n, ew, est</w>]? —
    // careful: 'newest' = n e w e s t </w>; (e,s) hits the SECOND e →
    // [n,e,w,es,t,</w>] → est → [n,e,w,est,</w>] → est</w> →
    // [n,e,w,est</w>] → (e,w) → [n,ew,est</w>] = 3 symbols.
    val expected = Seq((1L, 2L, 6L), (2L, 1L, 3L), (3L, 0L, 0L))
    assert(got == expected, s"got $got")
  }

  test("merge table relation is deterministic across runs") {
    val docs = core.Tables(spark, sfSmoke, "documents")
    def run() = BpeTrain.learnTable(spark, docs, "text", nMerges = 4)
      .collect().toSeq.sortBy(_.getInt(0))
    assert(run() == run())
  }

  test("fertility rolls encode + char counts into exact per-stratum basis points") {
    // merges = empty → every word costs len(word) + 1 symbols (chars +
    // </w>), so every figure is hand-computable:
    //   en: 1 doc, "ab ab"  → 2 words, 6 bpe, 4 chars
    //   fr: 2 docs, "abc"/"" → 1 word,  4 bpe, 3 chars
    //   zh: 1 doc, ""        → all zero → both ratios 0 (no div-by-zero)
    val docs = Seq(
      (1L, "ab ab", "en"),
      (2L, "abc", "fr"),
      (3L, "", "fr"),
      (4L, "", "zh")).toDF("doc_id", "text", "lang")
    val got = BpeTrain.fertility(docs, "doc_id", "text", "lang", Seq.empty)
      .orderBy("lang")
      .as[(String, Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      ("en", 1L, 2L, 6L, 4L, 30000L, 6666L),
      ("fr", 2L, 1L, 4L, 3L, 40000L, 7500L),
      ("zh", 1L, 0L, 0L, 0L, 0L, 0L)))
  }
}
