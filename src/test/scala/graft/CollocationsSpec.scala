package graft

import graft.operators.Collocations

/** Collocation mining on a fixture where the true phrase is known: a pair
  * that always co-occurs must out-lift pairs of independent frequent
  * words, and min-support must drop rare pairs.
  */
class CollocationsSpec extends SparkSpec {
  init()
  import spark.implicits._

  test("bound phrase wins; min-support filters the tail") {
    // "new york": 8 co-occurrences and NO independent occurrences of
    // either word → lift N/8. "is the": is always precedes the, but
    // "the" also appears twice more per doc → lift N/24 (diluted).
    // w$i-specific pairs occur ≤2× (below support); "rare gem" once.
    val docs = (0 until 8).map(i =>
      (i.toLong, s"new york w$i the w$i the end$i is the same")) :+
      (8L, "rare gem single")
    val out = Collocations
      .topByLift(docs.toDF("doc_id", "text"), "doc_id", "text", minCount = 5, k = 10)
      .select("gram", "lift", "rk")
      .as[(String, Double, Int)].collect().toSeq
    assert(out.head._1 == "new york", s"expected 'new york' at rank 1: $out")
    assert(!out.exists(_._1 == "rare gem"), "below-support pair must be filtered")
    val lift = out.map(r => r._1 -> r._2).toMap
    assert(lift("new york") > lift("is the"), s"bound phrase must out-lift diluted pair: $out")
  }

  test("deterministic across runs") {
    val docs = core.Tables(spark, sfSmoke, "documents")
    def run() = Collocations.topByLift(docs, "doc_id", "text", minCount = 3, k = 15)
      .orderBy("rk").collect().toSeq
    assert(run() == run())
  }
}
