package graft

import graft.operators.SeqPatterns

class SeqPatternsSpec extends SparkSpec {
  init()
  import spark.implicits._

  private def run(seqs: Map[String, Seq[String]], minSupport: Long = 1L)
      : Map[(String, String, String), (Long, Long, Long)] = {
    val rows = seqs.toSeq.flatMap { case (k, ss) =>
      ss.zipWithIndex.map { case (st, i) => (k, i.toLong, i.toLong, st) }
    }
    SeqPatterns.trigramSurprise(rows.toDF("k", "t", "tb", "s"), "k", "t", "tb", "s",
        minSupport)
      .as[(String, String, String, Long, Long, Long)].collect()
      .map { case (a, b, c, n, u, sb) => (a, b, c) -> ((n, u, sb)) }.toMap
  }

  private def brute(seqs: Map[String, Seq[String]], minSupport: Long)
      : Map[(String, String, String), (Long, Long, Long)] = {
    val pairs = seqs.values.toSeq.flatMap(s => s.sliding(2).filter(_.size == 2).map(p => (p(0), p(1))))
    val nAb = pairs.groupBy(identity).map { case (p, o) => p -> o.size.toLong }
    val nOut = pairs.groupBy(_._1).map { case (a, o) => a -> o.size.toLong }
    val tris = seqs.toSeq.flatMap { case (k, s) =>
      s.sliding(3).filter(_.size == 3).map(t => ((t(0), t(1), t(2)), k))
    }
    tris.groupBy(_._1).collect {
      case (t @ (a, b, c), occ) if occ.map(_._2).distinct.size >= minSupport =>
        val n = occ.size.toLong
        val u = occ.map(_._2).distinct.size.toLong
        val s = BigInt(10000) * n * nOut(b) / (BigInt(nAb((a, b))) * nAb((b, c)))
        t -> ((n, u, s.toLong))
    }.toMap
  }

  test("pure first-order chain scores 10000 away from sequence edges") {
    // deterministic cycle x->y->z->x: trigrams whose pair counts are not
    // truncated by sequence ends are exactly chain-predicted
    val seqs = (0 until 6).map(i => s"u$i" -> Seq.fill(4)(Seq("x", "y", "z")).flatten).toMap
    val got = run(seqs)
    assert(got == brute(seqs, 1L))
    assert(got(("x", "y", "z"))._3 == 10000L)
    assert(got(("z", "x", "y"))._3 == 10000L)
  }

  test("second-order structure surfaces above 10000") {
    // b is followed by c ONLY when preceded by a; (d,b) pairs go to e
    val seqs = Map(
      "u1" -> Seq("a", "b", "c", "a", "b", "c"),
      "u2" -> Seq("d", "b", "e", "d", "b", "e"),
      "u3" -> Seq("a", "b", "c", "d", "b", "e"))
    val got = run(seqs)
    assert(got == brute(seqs, 1L))
    // abc observed n, chain predicts n_ab*n_bc/n_b. with half the b-outs going each way
    assert(got(("a", "b", "c"))._3 > 10000L)
  }

  test("minSupport counts distinct keys, not occurrences") {
    val seqs = Map(
      "looper" -> Seq.fill(10)(Seq("p", "q", "r")).flatten,
      "other" -> Seq("p", "q", "r"))
    val all = run(seqs, minSupport = 1L)
    val sup2 = run(seqs, minSupport = 2L)
    val sup3 = run(seqs, minSupport = 3L)
    assert(all.keySet.contains(("p", "q", "r")))
    assert(sup2.keySet.contains(("p", "q", "r")) && sup2(("p", "q", "r"))._2 == 2L)
    assert(!sup3.keySet.contains(("p", "q", "r")))
    assert(all == brute(seqs, 1L) && sup2 == brute(seqs, 2L))
  }

  test("matches the brute replay on a mixed fixture") {
    val seqs = (0 until 40).map { i =>
      s"u$i" -> (0 until 12).map(j => "s" + ((i * 5 + j * j) % 4)).toSeq
    }.toMap
    assert(run(seqs, 2L) == brute(seqs, 2L))
  }
}
