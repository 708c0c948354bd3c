package graft

import graft.operators.Itemsets

/** A-Priori 2-itemset semantics: presence not multiplicity, support
  * pruning at both tiers, lift on a hand-computed fixture.
  */
class ItemsetsSpec extends SparkSpec {
  init()
  import spark.implicits._

  test("hand-computed pairs, support pruning, multiplicity-blind") {
    // 4 baskets: {a,b} ×3, {a,c}; item c df=1 (below support 2);
    // basket 1 repeats b — presence semantics must count it once
    val baskets = Seq(
      (1L, "a"), (1L, "b"), (1L, "b"),
      (2L, "a"), (2L, "b"),
      (3L, "a"), (3L, "b"),
      (4L, "a"), (4L, "c"))
      .toDF("bid", "item")
    val got = Itemsets.frequentPairs(baskets, "bid", "item", minSupport = 2)
      .as[(String, String, Long, Long, Long, Double)].collect().toSeq
    // only (a,b): cxy=3, dfa=4, dfb=3, lift = 3*4/(4*3) = 1.0
    assert(got == Seq(("a", "b", 3L, 4L, 3L, 1.0)))
  }

  test("negatively-correlated pair gets lift < 1, positive > 1") {
    // a,b always together (4 baskets); c,d each alone in opposite halves
    val baskets =
      (1L to 4L).flatMap(i => Seq((i, "a"), (i, "b"))) ++
        (5L to 8L).map(i => (i, "c")) ++
        (1L to 4L).map(i => (i, "c")) // c everywhere → independent-ish
    val got = Itemsets.frequentPairs(baskets.toDF("bid", "item"), "bid", "item", 2)
      .as[(String, String, Long, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._6).toMap
    assert(got(("a", "b")) > 1.0, s"bound pair must lift > 1: $got")
    assert(got(("a", "c")) < got(("a", "b")), s"diluted pair lifts lower: $got")
  }
}
