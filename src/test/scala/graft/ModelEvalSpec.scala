package graft

import graft.operators.ModelEval

class ModelEvalSpec extends SparkSpec {
  init()

  import spark.implicits._

  /** Brute Mann–Whitney over all pos×neg pairs. */
  private def bruteAuc(xs: Seq[(Long, Int)]): (Long, Long, Long, Long, Long) = {
    val pos = xs.filter(_._2 == 1).map(_._1)
    val neg = xs.filter(_._2 == 0).map(_._1)
    val conc = (for (p <- pos; n <- neg if p > n) yield 1L).sum
    val ties = (for (p <- pos; n <- neg if p == n) yield 1L).sum
    val auc = BigInt(10000) * (2 * conc + ties) / (BigInt(2) * pos.size * neg.size)
    (pos.size.toLong, neg.size.toLong, conc, ties, auc.toLong)
  }

  test("exact AUC equals the all-pairs count (ties, negatives, perfect, random)") {
    val rnd = new scala.util.Random(11)
    val fixtures = Seq(
      // perfect separation → 10000
      (1L to 10L).map(s => (s + 100, 1)) ++ (1L to 10L).map(s => (s, 0)),
      // anti-separation → 0
      (1L to 10L).map(s => (s, 1)) ++ (1L to 10L).map(s => (s + 100, 0)),
      // all tied → exactly 5000
      Seq.fill(7)((42L, 1)) ++ Seq.fill(9)((42L, 0)),
      // negatives + ties + sparse scores
      Seq((-50L, 1), (-50L, 0), (0L, 1), (3L, 0), (900000L, 1), (900000L, 0), (-1000L, 0)),
      // random
      Seq.fill(300)((rnd.nextInt(40).toLong - 20, rnd.nextInt(2))))
    fixtures.foreach { xs =>
      val got = ModelEval.exactAuc(xs.toDF("score", "y"), "score", "y")
        .as[(Long, Long, Long, Long, Long)].head()
      assert(got == bruteAuc(xs), s"fixture ${xs.take(5)}…")
    }
    assert(ModelEval.exactAuc(fixtures.head.toDF("score", "y"), "score", "y")
      .as[(Long, Long, Long, Long, Long)].head()._5 == 10000L)
  }

  test("AUC histogram path recurses past the prefix block size") {
    // 20 000 distinct scores at the default 4096 block size → the prefix
    // roll-up recurses; equality vs all-pairs still exact
    val xs = (0 until 20000).map(i => (i.toLong * 3, if ((i * 2654435761L) % 5 < 2) 1 else 0))
    val got = ModelEval.exactAuc(xs.toDF("score", "y"), "score", "y")
      .as[(Long, Long, Long, Long, Long)].head()
    assert(got == bruteAuc(xs))
  }

  test("single-class and empty inputs yield NULL AUC, not a throw") {
    val onlyPos = Seq((5L, 1), (9L, 1)).toDF("score", "y")
    val r = ModelEval.exactAuc(onlyPos, "score", "y").collect()(0)
    assert(r.getLong(0) == 2L && r.getLong(1) == 0L && r.isNullAt(4))
    val empty = Seq.empty[(Long, Int)].toDF("score", "y")
    val e = ModelEval.exactAuc(empty, "score", "y").collect()(0)
    assert(e.getLong(0) == 0L && e.getLong(1) == 0L && e.isNullAt(4))
  }

  test("calibration buckets: exact widths, exhaustive, rates match brute") {
    val xs = Seq((0L, 1), (1L, 0), (5L, 1), (9L, 1), (10L, 0), (19L, 0), (19L, 1))
    // range [0,19], width ceil(20/4) = 5 → buckets 0..3
    val got = ModelEval.calibrationBuckets(xs.toDF("score", "y"), "score", "y", 4)
      .orderBy("bucket")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (0L, 0L, 2L, 1L, 5000L),   // scores 0, 1
      (1L, 5L, 2L, 2L, 10000L),  // scores 5, 9
      (2L, 10L, 1L, 0L, 0L),     // score 10
      (3L, 15L, 2L, 1L, 5000L))) // the two 19s
    assert(got.map(_._3).sum == xs.size)
  }

  test("Cohen's kappa: the 1960 textbook confusion matrix") {
    import spark.implicits._
    // yes/yes 20, yes/no 5, no/yes 10, no/no 15: po=0.7, pe=0.5, κ=0.4
    val rows =
      Seq.fill(20)(("yes", "yes")) ++ Seq.fill(5)(("yes", "no")) ++
        Seq.fill(10)(("no", "yes")) ++ Seq.fill(15)(("no", "no"))
    val got = graft.operators.ModelEval
      .cohenKappa(rows.toDF("a", "b"), "a", "b")
      .as[(Long, Long, Long, Long, Option[Long])].head()
    assert(got == ((50L, 35L, 7000L, 5000L, Some(4000L))))
  }

  test("Cohen's kappa: negative kappa truncates toward zero (the div-vs-floor seam)") {
    import spark.implicits._
    // zero agreement, pe_bp = 40000/9 → 4444; κ_bp = −44440000/5556 =
    // −7998.56…: trunc −7998, floor would be −7999 — pins Spark `div`
    val rows = Seq(("a", "b"), ("a", "b"), ("b", "a"))
    val got = graft.operators.ModelEval
      .cohenKappa(rows.toDF("a", "b"), "a", "b")
      .as[(Long, Long, Long, Long, Option[Long])].head()
    assert(got == ((3L, 0L, 0L, 4444L, Some(-7998L))))
  }

  test("Cohen's kappa: perfect constant raters are undefined (NULL), nulls drop") {
    import spark.implicits._
    val const = Seq(("x", "x"), ("x", "x")).toDF("a", "b")
    val k1 = graft.operators.ModelEval.cohenKappa(const, "a", "b").head()
    assert(k1.getAs[Long]("pe_bp") == 10000L && k1.isNullAt(4))
    val withNulls = Seq(
      (Some("x"), Some("x")), (Some("y"), Some("y")),
      (None, Some("x")), (Some("x"), None)).toDF("a", "b")
    val k2 = graft.operators.ModelEval.cohenKappa(withNulls, "a", "b").head()
    assert(k2.getAs[Long]("n") == 2L && k2.getAs[Long]("n_agree") == 2L)
  }

  test("average precision: distinct-threshold definition, ties, hand-computed") {
    import spark.implicits._
    // scores desc: 9 (1 pos), 7 (1 pos + 1 neg TIED), 3 (1 neg)
    // thresholds: >=9: P=1/1; >=7: P=2/3; >=3: P=2/4
    // AP = (1·⌊10⁷·1/1⌋ + 1·⌊10⁷·2/3⌋) / 2 = (10000000 + 6666666) / 2
    val scored = Seq((9L, 1), (7L, 1), (7L, 0), (3L, 0)).toDF("score", "y")
    val r = graft.operators.ModelEval.averagePrecision(scored, "score", "y").head()
    assert(r.getAs[Long]("n_pos") == 2L && r.getAs[Long]("n") == 4L)
    assert(r.getAs[Long]("ap_mbp") == (10000000L + 6666666L) / 2)
    assert(r.getAs[Long]("p_at_all_bp") == 5000L)
    // a perfect ranker reaches 10^7; random-ish base rate is the floor
    val perfect = Seq((5L, 1), (4L, 1), (1L, 0), (0L, 0)).toDF("score", "y")
    val rp = graft.operators.ModelEval.averagePrecision(perfect, "score", "y").head()
    assert(rp.getAs[Long]("ap_mbp") == 10000000L)
    // single-class: NULL, not a throw
    val onlyNeg = Seq((5L, 0), (4L, 0)).toDF("score", "y")
    val rn = graft.operators.ModelEval.averagePrecision(onlyNeg, "score", "y").head()
    assert(rn.isNullAt(2))
    // negative scores shift cleanly
    val neg = Seq((-5L, 1), (-9L, 0)).toDF("score", "y")
    val rg = graft.operators.ModelEval.averagePrecision(neg, "score", "y").head()
    assert(rg.getAs[Long]("ap_mbp") == 10000000L)
  }
}
