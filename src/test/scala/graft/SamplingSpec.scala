package graft

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.operators.Sampling

class SamplingSpec extends SparkSpec {
  init()

  private lazy val docs = Tables(spark, sfSmoke, "documents")

  test("hash split: deterministic, exhaustive, fractions in tolerance") {
    val s1 = Sampling.hashSplit(docs, "doc_id", Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    val s2 = Sampling.hashSplit(docs, "doc_id", Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    // same assignment on re-run (no RNG state)
    assert(s1.select("doc_id", "split").exceptAll(s2.select("doc_id", "split")).isEmpty)
    val counts = s1.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = docs.count().toDouble
    assert(counts.values.sum == n.toLong) // every row lands somewhere
    assert(math.abs(counts.getOrElse("train", 0L) / n - 0.8) < 0.06, counts.toString)
    assert(math.abs(counts.getOrElse("val", 0L) / n - 0.1) < 0.05, counts.toString)
  }

  test("hash split: assignment independent of the rest of the corpus") {
    // incremental-ingest stability: a record's split never changes when
    // other records appear
    val half = docs.filter(col("doc_id") % 2 === 0)
    val full = Sampling.hashSplit(docs, "doc_id", Seq("a" -> 0.5, "b" -> 0.5))
      .filter(col("doc_id") % 2 === 0).select("doc_id", "split")
    val part = Sampling.hashSplit(half, "doc_id", Seq("a" -> 0.5, "b" -> 0.5))
      .select("doc_id", "split")
    assert(full.exceptAll(part).isEmpty && part.exceptAll(full).isEmpty)
  }

  test("stratified cap: bound respected, deterministic, subset of input") {
    import spark.implicits._
    val df = (1L to 1000L).map(i => (i, s"s${i % 3}")).toDF("id", "src")
    val capped = Sampling.stratifiedCap(df, "src", "id", 50)
    val per = capped.groupBy("src").count().as[(String, Long)].collect().toMap
    assert(per.values.forall(_ == 50), per.toString) // each stratum has > 50 inputs
    val again = Sampling.stratifiedCap(df, "src", "id", 50)
    assert(capped.exceptAll(again).isEmpty && again.exceptAll(capped).isEmpty)
    assert(capped.exceptAll(df).isEmpty) // selection only, rows unchanged
  }

  test("weighted sample: per-stratum rates, nested survivors, isolation") {
    import spark.implicits._
    val df = (1L to 3000L).map(i => (i, s"s${i % 3}")).toDF("id", "src")
    val kept = Sampling.weightedSample(df, "id", "src",
      Seq("s0" -> 0.8, "s1" -> 0.4), defaultRate = 0.1)
    val per = kept.groupBy("src").count().as[(String, Long)].collect().toMap
    // 1000 rows per stratum; MD5-uniform keeps ≈ rate within a loose band
    assert(per("s0") > 700 && per("s0") < 900, per.toString)
    assert(per("s1") > 300 && per("s1") < 500, per.toString)
    assert(per("s2") > 50 && per("s2") < 160, per.toString)
    // lowering a rate yields a SUBSET (same hash, smaller threshold)
    val fewer = Sampling.weightedSample(df, "id", "src",
      Seq("s0" -> 0.4, "s1" -> 0.4), defaultRate = 0.1)
    assert(fewer.filter($"src" === "s0").exceptAll(kept.filter($"src" === "s0")).isEmpty)
    // ...and other strata are untouched by s0's retune
    assert(fewer.filter($"src" =!= "s0").exceptAll(kept.filter($"src" =!= "s0")).isEmpty &&
      kept.filter($"src" =!= "s0").exceptAll(fewer.filter($"src" =!= "s0")).isEmpty)
    // deterministic across runs
    val again = Sampling.weightedSample(df, "id", "src",
      Seq("s0" -> 0.8, "s1" -> 0.4), defaultRate = 0.1)
    assert(kept.exceptAll(again).isEmpty && again.exceptAll(kept).isEmpty)
  }

  test("isqrt: exact over ranges and near perfect squares") {
    import spark.implicits._
    // 0..5000 + values straddling perfect-square boundaries at long scale
    val vals = (0L to 5000L) ++ Seq(
      (1L << 31) - 1, 1L << 31, 3037000499L * 3037000499L - 1,
      3037000499L * 3037000499L, 999999999999999999L)
    val got = vals.toDF("x")
      .select(col("x"), Sampling.isqrt(col("x")).as("s"))
      .as[(Long, Long)].collect()
    got.foreach { case (x, s) =>
      assert(s >= 0 && s * s <= x, s"isqrt($x) = $s overshoots")
      assert(x - s * s <= 2 * s, s"isqrt($x) = $s undershoots") // (s+1)² > x
    }
  }

  test("mixture plan: sqrt weights flatten skew, quotas floor and cap") {
    import spark.implicits._
    // 900 / 100 / 16 / 1 rows: α = 1/2 weights 30 / 10 / 4 / 1
    val df = ((1L to 900L).map((_, "big")) ++ (1001L to 1100L).map((_, "mid")) ++
      (2001L to 2016L).map((_, "sml")) ++ Seq((3001L, "one"))).toDF("id", "s")
    val plan = Sampling.mixturePlan(df, "s", totalN = 90)
      .as[(String, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(plan("big") == (("big", 900L, 30L, 60L)))  // 90·30/45
    assert(plan("mid") == (("mid", 100L, 10L, 20L)))
    assert(plan("sml") == (("sml", 16L, 4L, 8L)))
    assert(plan("one") == (("one", 1L, 1L, 1L)))      // capped at n_in = 1 (< 90/45)
    // α = 1/2 compresses a 900:1 ratio to 60:1 quota ratio, never oversubscribes
    assert(plan.values.map(_._4).sum <= 90)
  }

  test("temperature sample: quotas met exactly, MD5-prefix stable, deterministic") {
    import spark.implicits._
    val df = ((1L to 300L).map((_, "big")) ++ (1001L to 1030L).map((_, "sml")))
      .toDF("id", "s")
    val plan = Sampling.mixturePlan(df, "s", totalN = 60)
      .as[(String, Long, Long, Long)].collect().map(r => r._1 -> r._4).toMap
    val sel = Sampling.temperatureSample(df, "s", "id", totalN = 60)
    val per = sel.groupBy("s").count().as[(String, Long)].collect().toMap
    assert(per == plan, s"selected $per != quotas $plan")
    assert(sel.exceptAll(df).isEmpty) // selection only
    // raising N keeps each stratum's selection a PREFIX (md5 order is fixed)
    val more = Sampling.temperatureSample(df, "s", "id", totalN = 100)
    assert(sel.exceptAll(more).isEmpty, "smaller sample must nest in larger")
    val again = Sampling.temperatureSample(df, "s", "id", totalN = 60)
    assert(sel.exceptAll(again).isEmpty && again.exceptAll(sel).isEmpty)
  }

  test("leakage-safe split: co-membership is a theorem; naive split leaks") {
    import spark.implicits._
    // 400 docs in 100 four-member clusters (rep = min id of each)
    val docs = (1L to 400L).toDF("id")
    val clusters = (1L to 400L).map(i => (i, ((i - 1) / 4) * 4 + 1)).toDF("cid", "rep")
    val split = Sampling.leakageSafeSplit(
      docs, "id", clusters, "cid", "rep",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    // every cluster lands in exactly one split
    val perCluster = split.groupBy("rep")
      .agg(countDistinct("split").as("ns")).agg(max("ns")).head().getLong(0)
    assert(perCluster == 1L)
    // and the naive per-doc split separates at least one planted cluster
    val naive = Sampling.hashSplit(
      clusters.select(col("cid"), col("rep")), "cid",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    val leaked = naive.groupBy("rep")
      .agg(countDistinct("split").as("ns")).filter(col("ns") > 1).count()
    assert(leaked > 0, "fixture should demonstrate the leak the operator prevents")
    // docs absent from the cluster map become singleton clusters
    val partial = Sampling.leakageSafeSplit(
      docs, "id", clusters.filter(col("cid") <= 100), "cid", "rep",
      Seq("train" -> 0.5, "test" -> 0.5))
    assert(partial.filter(col("id") > 100 && col("rep") =!= col("id")).isEmpty)
  }

  test("leakage_safe_split TVF matches the operator") {
    import spark.implicits._
    (1L to 60L).toDF("id").createOrReplaceTempView("lss_docs")
    (1L to 60L).map(i => (i, ((i - 1) / 3) * 3 + 1)).toDF("cid", "rep")
      .createOrReplaceTempView("lss_clusters")
    val sqlDf = spark.sql(
      "SELECT * FROM leakage_safe_split('lss_docs', 'id', 'lss_clusters', " +
        "'cid', 'rep', 'train:0.8|val:0.1|test:0.1')")
    val scalaDf = Sampling.leakageSafeSplit(
      spark.table("lss_docs"), "id", spark.table("lss_clusters"), "cid", "rep",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    assert(sqlDf.columns.toSeq == scalaDf.columns.toSeq)
    assert(sqlDf.exceptAll(scalaDf).isEmpty && scalaDf.exceptAll(sqlDf).isEmpty)
  }

  test("PPS systematic: sum(n_hits) = k and per-row hits in {floor,ceil}(kw/W)") {
    import spark.implicits._
    // skewed integer weights incl. one heavy row owning ~1/3 of the mass
    val rows = (1L to 200L).map(i => (i, 1L + (i * 7) % 23)) :+ (500L, 1200L)
    val df = rows.toDF("id", "w")
    val totalW = rows.map(_._2).sum
    val k = 30
    val got = Sampling.ppsSystematic(df, "id", "w", k)
      .as[(Long, Long, Long)].collect()
    assert(got.map(_._3).sum == k, s"hits must telescope to k: ${got.map(_._3).sum}")
    got.foreach { case (id, w, h) =>
      val lo = (k.toLong * w) / totalW
      val hi = lo + (if ((k.toLong * w) % totalW == 0) 0 else 1)
      assert(h >= lo && h <= hi, s"row $id: $h not in [$lo,$hi] for w=$w")
    }
    // the heavy row (k·w/W = 30·1200/3586 ≈ 10) is multi-drawn
    val heavy = got.find(_._1 == 500L).get
    assert(heavy._3 >= 2, s"heavy row drew ${heavy._3}")
    // determinism + zero-weight exclusion
    val again = Sampling.ppsSystematic(df, "id", "w", k)
      .as[(Long, Long, Long)].collect()
    assert(got.sortBy(_._1).toSeq == again.sortBy(_._1).toSeq)
    val withZero = (rows :+ (600L, 0L)).toDF("id", "w")
    val z = Sampling.ppsSystematic(withZero, "id", "w", k)
      .as[(Long, Long, Long)].collect()
    assert(!z.exists(_._1 == 600L) && z.map(_._3).sum == k)
  }

  test("pps_sample TVF matches the operator") {
    import spark.implicits._
    (1L to 50L).map(i => (i, 1L + i % 9)).toDF("id", "w")
      .createOrReplaceTempView("pps_in")
    val sqlDf = spark.sql("SELECT * FROM pps_sample('pps_in', 'id', 'w', 10)")
    val scalaDf = Sampling.ppsSystematic(spark.table("pps_in"), "id", "w", 10)
    assert(sqlDf.columns.toSeq == scalaDf.columns.toSeq)
    assert(sqlDf.exceptAll(scalaDf).isEmpty && scalaDf.exceptAll(sqlDf).isEmpty)
  }

  test("PPS systematic rejects negative weights by name") {
    import spark.implicits._
    val ex = intercept[IllegalArgumentException] {
      Sampling.ppsSystematic(
        Seq((1L, 5L), (2L, -1L), (3L, 4L)).toDF("id", "w"), "id", "w", 3)
    }
    assert(ex.getMessage.contains("non-negative"), ex.getMessage)
  }
}
