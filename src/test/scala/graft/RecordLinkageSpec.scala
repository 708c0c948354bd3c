package graft

import org.apache.spark.sql.functions._

import graft.operators.RecordLinkage
import graft.operators.RecordLinkage.AttrWeight

class RecordLinkageSpec extends SparkSpec {
  init()

  import spark.implicits._

  // source A: 8 records; name near-unique, city 2-valued
  private lazy val a = Seq(
    (1L, "ann", "nyc"), (2L, "bob", "nyc"), (3L, "cat", "sfo"), (4L, "dan", "sfo"),
    (5L, "eve", "nyc"), (6L, "fay", "sfo"), (7L, "gus", "nyc"), (8L, "ann", "sfo")
  ).toDF("id", "name", "city")

  // source B: ids +100; record 2's name dirtied, record 3's city dirtied
  private lazy val b = Seq(
    (101L, "ann", "nyc"), (102L, "bobb", "nyc"), (103L, "cat", "nyc"), (104L, "dan", "sfo")
  ).toDF("id", "name", "city")

  test("u counts are exact Σf²/n² with NULL as a value") {
    val u = RecordLinkage.uCounts(a, Seq("name", "city"))
      .as[(String, Long, Long)].collect().map { case (k, v, w) => k -> (v, w) }.toMap
    // name freqs: ann=2, others 1×6 -> Σf² = 4+6 = 10; n² = 64
    assert(u("name") == ((10L, 64L)))
    // city freqs: nyc=4, sfo=4 -> 32/64
    assert(u("city") == ((32L, 64L)))
    val withNull = a.withColumn("name", when(col("id") <= 2, lit(null)).otherwise(col("name")))
    val un = RecordLinkage.uCounts(withNull, Seq("name")).as[(String, Long, Long)].head()
    // null×2, ann, cat..gus ×1(6) -> 4 + 6... ann remains once (id 8) so 2²+6·1 = 10
    assert(un._2 == 10L && un._3 == 64L)
  }

  test("m counts Laplace-smooth the labeled agreement") {
    val labeled = Seq((1L, 101L), (2L, 102L), (3L, 103L), (4L, 104L)).toDF("x_id", "y_id")
    val m = RecordLinkage.mCounts(a, b, "id", "id", labeled, Seq("name", "city"))
      .as[(String, Long, Long)].collect().map { case (k, v, w) => k -> (v, w) }.toMap
    assert(m("name") == ((3L + 1L, 4L + 2L))) // 3 of 4 agree
    assert(m("city") == ((3L + 1L, 4L + 2L)))
  }

  test("score products replicate the log-sum ordering and the decisions") {
    val labeled = Seq((1L, 101L), (2L, 102L), (3L, 103L), (4L, 104L)).toDF("x_id", "y_id")
    val attrs = Seq("name", "city")
    val w = RecordLinkage.fsWeights(a, b, "id", "id", labeled, attrs)
    // reduced fractions stay exact: agree_name = (4/6)/(10/64) = 128/30 -> 64/15
    assert(w.head == AttrWeight("name", 64L, 15L, 32L, 81L))
    val cands = Seq((1L, 101L), (2L, 102L), (3L, 103L), (4L, 104L), (5L, 101L))
      .toDF("x_id", "y_id")
    val scored = RecordLinkage
      .scorePairs(a, b, "id", "id", attrs, cands, w, thetaNum = 4L)
      .select("x_id", "y_id", "score_num", "score_den", "is_match")
      .collect()
      .map(r => (r.getLong(0), (BigInt(r.getString(2)), BigInt(r.getString(3)), r.getBoolean(4))))
      .toMap
    // ordering must equal the float log-sum ordering
    val logScore = scored.map { case (x, (n, d, _)) =>
      x -> math.log(n.toDouble / d.toDouble)
    }
    val byExact = scored.toSeq.sortBy { case (_, (n, d, _)) =>
      n.toDouble / d.toDouble
    }.map(_._1)
    val byLog = logScore.toSeq.sortBy(_._2).map(_._1)
    assert(byExact == byLog)
    // perfect-agreement pairs (1,4) clear θ=4; the (5,101) decoy
    // disagrees on name (eve vs ann) and must fail
    assert(scored(1L)._3 && scored(4L)._3)
    assert(!scored(5L)._3)
  }

  test("fs_link TVF matches the operator") {
    a.createOrReplaceTempView("fs_a")
    b.createOrReplaceTempView("fs_b")
    Seq((1L, 101L), (2L, 102L), (3L, 103L), (4L, 104L)).toDF("x_id", "y_id")
      .createOrReplaceTempView("fs_lab")
    Seq((1L, 101L), (5L, 101L)).toDF("x_id", "y_id")
      .createOrReplaceTempView("fs_cand")
    val sqlDf = spark.sql(
      "SELECT * FROM fs_link('fs_a', 'fs_b', 'id', 'id', 'fs_lab', 'fs_cand', 'name,city', 4)")
    val w = RecordLinkage.fsWeights(
      spark.table("fs_a"), spark.table("fs_b"), "id", "id",
      spark.table("fs_lab"), Seq("name", "city"))
    val scalaDf = RecordLinkage.scorePairs(
      spark.table("fs_a"), spark.table("fs_b"), "id", "id",
      Seq("name", "city"), spark.table("fs_cand"), w, thetaNum = 4L)
    assert(sqlDf.columns.toSeq == scalaDf.columns.toSeq)
    assert(sqlDf.exceptAll(scalaDf).isEmpty && scalaDf.exceptAll(sqlDf).isEmpty)
  }

  // the q168 fixture shape on the smoke customer table: a perturbed
  // second source, true-alignment + decoy candidates
  private lazy val fix = {
    val c = spark.read.parquet(s"$sfSmoke/customer.parquet").select(
      col("c_custkey").as("id"),
      col("c_name").as("name"),
      col("c_nationkey").cast("long").as("nat"),
      col("c_mktsegment").as("seg"),
      expr("CAST(round(c_acctbal * 100) AS BIGINT)").as("cents"))
    val off = 1000000L
    val bb = c.select(
      (col("id") + off).as("id"),
      when(pmod(col("id"), lit(7)) === 0, concat(col("name"), lit("~")))
        .otherwise(col("name")).as("name"),
      when(pmod(col("id"), lit(5)) === 0, pmod(col("nat") + 1, lit(25)))
        .otherwise(col("nat")).as("nat"),
      when(pmod(col("id"), lit(11)) === 0, lit("UNKNOWN"))
        .otherwise(col("seg")).as("seg"),
      when(pmod(col("id"), lit(3)) === 0, col("cents") + 1)
        .otherwise(col("cents")).as("cents"))
    val labeled = c.filter(pmod(col("id"), lit(10)) === 0)
      .select(col("id").as("x_id"), (col("id") + off).as("y_id"))
    val nC = c.count()
    val cands = c.select(col("id").as("x_id"), (col("id") + off).as("y_id"))
      .unionByName(c.select(col("id").as("x_id"),
        (pmod(col("id") + 1, lit(nC)) + 1 + off).as("y_id")))
    (c, bb, labeled, cands)
  }
  private val fixAttrs = Seq("name", "nat", "seg", "cents")

  private def logW(w: AttrWeight): Double =
    math.log(w.agreeNum.toDouble / w.agreeDen)

  test("fsWeightsSampled: full stratum IS fsWeights; half stratum keeps every decision") {
    val (c, bb, labeled, cands) = fix
    val full = RecordLinkage.fsWeights(c, bb, "id", "id", labeled, fixAttrs)
    val w10000 = RecordLinkage.fsWeightsSampled(c, bb, "id", "id", labeled, fixAttrs, 10000L)
    assert(w10000 == full)

    val w5000 = RecordLinkage.fsWeightsSampled(c, bb, "id", "id", labeled, fixAttrs, 5000L)
    // scale-free (categorical) attrs estimate within sampling tolerance
    full.zip(w5000).filter(p => Seq("nat", "seg").contains(p._1.attr)).foreach {
      case (f, s) =>
        assert(math.abs(logW(f) - logW(s)) < 0.4,
          s"${f.attr}: full=${logW(f)} stratum=${logW(s)}")
    }
    // decisions survive the stratum estimate verbatim
    def decisions(w: Seq[AttrWeight]) = RecordLinkage
      .scorePairs(c, bb, "id", "id", fixAttrs, cands, w, thetaNum = 1000L)
      .select("x_id", "y_id", "is_match")
      .as[(Long, Long, Boolean)].collect()
      .map(r => ((r._1, r._2), r._3)).toMap
    val dFull = decisions(full)
    val dStr = decisions(w5000)
    assert(dFull == dStr, "stratum weights flipped a decision")
  }

  test("fsWeightsEm: unsupervised EM recovers the labeled ranking and is deterministic") {
    val (c, bb, labeled, cands) = fix
    val full = RecordLinkage.fsWeights(c, bb, "id", "id", labeled, fixAttrs)
    val em = RecordLinkage.fsWeightsEm(c, bb, "id", "id", cands, fixAttrs)
    val em2 = RecordLinkage.fsWeightsEm(c, bb, "id", "id", cands, fixAttrs)
    assert(em == em2, "EM must be bit-deterministic")
    // agreement factors keep the m > u orientation
    em.foreach(w => assert(w.agreeNum > 0 && w.agreeDen > 0 && logW(w) > 0, w.toString))
    // EM and labeled weights live on different SCALES (EM's u is
    // "agreement among candidate non-matches", the labeled path's is
    // "agreement among random pairs"), so a fixed θ does not transfer —
    // the invariant that must survive is the RANKING: the top-k pairs by
    // EM score are exactly the labeled-weight match set
    def scored(w: Seq[AttrWeight]) = RecordLinkage
      .scorePairs(c, bb, "id", "id", fixAttrs, cands, w, thetaNum = 1000L)
      .select(
        col("x_id"), col("y_id"),
        (col("score_num").cast("double") / col("score_den").cast("double")).as("s"),
        col("is_match"))
    val matchesFull = scored(full).filter(col("is_match"))
      .select("x_id", "y_id").as[(Long, Long)].collect().toSet
    val k = matchesFull.size
    assert(k > 0, "fixture must produce labeled-weight matches")
    val topEm = scored(em).orderBy(desc("s"), col("x_id"), col("y_id"))
      .limit(k).select("x_id", "y_id").as[(Long, Long)].collect().toSet
    assert(topEm == matchesFull,
      s"EM top-$k diverges from the labeled match set: overlap ${(topEm & matchesFull).size}")
  }

  test("fs_link_em TVF matches the operator") {
    val (c, bb, _, cands) = fix
    c.createOrReplaceTempView("fsem_a")
    bb.createOrReplaceTempView("fsem_b")
    cands.createOrReplaceTempView("fsem_cand")
    val sqlDf = spark.sql(
      "SELECT * FROM fs_link_em('fsem_a', 'fsem_b', 'id', 'id', 'fsem_cand', " +
        "'name,nat,seg,cents', 1000000, 8)")
    val w = RecordLinkage.fsWeightsEm(
      spark.table("fsem_a"), spark.table("fsem_b"), "id", "id",
      spark.table("fsem_cand"), fixAttrs, iters = 8)
    val scalaDf = RecordLinkage.scorePairs(
      spark.table("fsem_a"), spark.table("fsem_b"), "id", "id",
      fixAttrs, spark.table("fsem_cand"), w, thetaNum = 1000000L)
    assert(sqlDf.columns.toSeq == scalaDf.columns.toSeq)
    assert(sqlDf.exceptAll(scalaDf).isEmpty && scalaDf.exceptAll(sqlDf).isEmpty)
  }
}
