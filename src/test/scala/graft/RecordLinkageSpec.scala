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
      .map(r => (r.getLong(0), (r.getDecimal(2), r.getDecimal(3), r.getBoolean(4))))
      .toMap
    // ordering must equal the float log-sum ordering
    val logScore = scored.map { case (x, (n, d, _)) =>
      x -> math.log(n.doubleValue() / d.doubleValue())
    }
    val byExact = scored.toSeq.sortBy { case (_, (n, d, _)) =>
      n.doubleValue() / d.doubleValue()
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
}
