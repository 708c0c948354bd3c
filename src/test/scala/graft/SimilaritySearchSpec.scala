package graft

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.operators.SimilaritySearch

class SimilaritySearchSpec extends SparkSpec {
  init()

  private lazy val emb = Tables(spark, sfSmoke, "embeddings")
  private lazy val queries = emb.filter(col("vec_id") < 20)
    .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
  private lazy val corpus = emb
    .select(col("vec_id").as("n_id"), col("embedding").as("n_emb"))

  test("cosine expression matches a driver-side computation") {
    import spark.implicits._
    val rows = emb.filter(col("vec_id") < 2)
      .select("vec_id", "embedding").as[(Long, Seq[Float])].collect()
    val expected = {
      val a = rows(0)._2.map(_.toDouble)
      val b = rows(1)._2.map(_.toDouble)
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val got = emb.filter(col("vec_id") === 0)
      .crossJoin(emb.filter(col("vec_id") === 1).select(col("embedding").as("e2")))
      .select(SimilaritySearch.cosine(col("embedding"), col("e2")).as("c"))
      .head().getDouble(0)
    assert(math.abs(got - expected) < 1e-12)
  }

  test("native cosine_sim is bit-identical to the composed HOF form (400 random pairs + edges)") {
    import spark.implicits._
    // seeded vectors: negatives, zeros, denormal-ish magnitudes, mixed dims
    val rnd = new scala.util.Random(42)
    def vec(n: Int): Seq[Float] =
      Seq.fill(n)((rnd.nextDouble() * 2 - 1).toFloat * (if (rnd.nextInt(10) == 0) 1e-20f else 1f))
    val pairs = (0 until 400).map { i =>
      val n = 1 + rnd.nextInt(96)
      (i.toLong, vec(n), vec(n))
    } ++ Seq(
      (1002L, Seq(1f, 2f), Seq(3f, 4f, 5f))) // length mismatch → null both forms
    val df = pairs.toDF("id", "a", "b")
      .select(col("id"), col("a").cast("array<float>").as("a"), col("b").cast("array<float>").as("b"))
    val both = df.select(
        col("id"),
        SimilaritySearch.cosine(col("a"), col("b")).as("fused"),
        SimilaritySearch.cosineComposed(col("a"), col("b")).as("composed"))
      .collect()
    both.foreach { r =>
      val (f, c) = (r.get(1), r.get(2))
      assert(
        (f == null && c == null) ||
          (f != null && c != null &&
            java.lang.Double.doubleToLongBits(r.getDouble(1)) ==
              java.lang.Double.doubleToLongBits(r.getDouble(2))),
        s"id=${r.getLong(0)}: fused=$f composed=$c")
    }
  }

  test("cosine_sim null semantics: null array, null element, and zero norm all yield null") {
    val df = spark.sql(
      """SELECT cosine_sim(cast(array(1.0, 2.0) AS array<float>), cast(NULL AS array<float>)) AS a,
        |       cosine_sim(cast(array(1.0, NULL) AS array<float>), cast(array(1.0, 2.0) AS array<float>)) AS b,
        |       cosine_sim(cast(array(0.0, 0.0) AS array<float>), cast(array(1.0, 2.0) AS array<float>)) AS c""".stripMargin)
    val r = df.head()
    assert(r.isNullAt(0) && r.isNullAt(1))
    // try_divide semantics on zero norm — the composed HOF form THROWS here
    // under Spark 4 ANSI (a single zero embedding would kill a corpus job)
    assert(r.isNullAt(2))
  }

  // The synthetic embeddings are structureless (max natural pairwise cosine
  // ≈ 0.48; nearest neighbors sit at θ ≈ 70°), so recall tests use PLANTED
  // near-copies — the regime approximate search exists for. Natural-data
  // behavior is covered by the soundness (subset) check.
  private lazy val planted = {
    val base = emb.select(col("vec_id").as("vid"), col("embedding").as("emb"))
    val copies = base.select(
      (col("vid") + 10000).as("vid"),
      zip_with(
        col("emb"),
        sequence(lit(0), lit(63)),
        (x, i) =>
          (x.cast("double") +
            when(pmod(i, lit(2)) === 0, lit(0.003)).otherwise(lit(-0.003)))
            .cast("float")).as("emb"))
    base.unionByName(copies)
  }

  test("LSH top-1 retrieves each planted near-copy at scale params (8 bits x 16 tables)") {
    val qs = planted.filter(col("vid") >= 10000 && col("vid") < 10020)
      .select(col("vid").as("q_id"), col("emb").as("q_emb"))
    val corp = planted.filter(col("vid") < 10000)
      .select(col("vid").as("n_id"), col("emb").as("n_emb"))
    val top1 = SimilaritySearch.lshTopK(qs, corp, 1)
    import spark.implicits._
    val got = top1.select("q_id", "n_id").as[(Long, Long)].collect().toMap
    (10000L until 10020L).foreach { q =>
      assert(got.get(q).contains(q - 10000), s"query $q retrieved ${got.get(q)}")
    }
  }

  test("LSH candidate generation prunes on the planted corpus") {
    val b = SimilaritySearch.bucketize(planted, "vid", "emb", 16, 8, 64)
    val cand = b.select(col("vid").as("x_id"), col("tbl"), col("bucket"))
      .join(b.select(col("vid").as("y_id"), col("tbl"), col("bucket")), Seq("tbl", "bucket"))
      .filter(col("x_id") < col("y_id"))
      .select("x_id", "y_id").dropDuplicates().count()
    val n = planted.count()
    val all = n * (n - 1) / 2
    assert(cand < all / 2, s"LSH barely prunes: $cand of $all")
  }

  test("IVF top-1 retrieves each planted near-copy") {
    val qs = planted.filter(col("vid") >= 10000 && col("vid") < 10020)
      .select(col("vid").as("q_id"), col("emb").as("q_emb"))
    val corp = planted.filter(col("vid") < 10000)
      .select(col("vid").as("n_id"), col("emb").as("n_emb"))
    // near-identical vectors quantize to the same cell; nProbe > 1 covers
    // boundary cells
    val top1 = SimilaritySearch.ivfTopK(qs, corp, 1, nCells = 16, nProbe = 4)
    import spark.implicits._
    val got = top1.select("q_id", "n_id").as[(Long, Long)].collect().toMap
    (10000L until 10020L).foreach { q =>
      assert(got.get(q).contains(q - 10000), s"query $q retrieved ${got.get(q)}")
    }
  }

  test("IVF probes a strict subset of the corpus (cell pruning)") {
    val qs = queries.limit(5)
    // with nCells cells and nProbe probes, candidate volume per query must
    // be well under the corpus size
    val centroidsProbe = SimilaritySearch.ivfTopK(qs, corpus, 10, nCells = 16, nProbe = 2)
    // sanity: results exist and are valid corpus ids
    assert(centroidsProbe.count() > 0)
    val ids = corpus.select("n_id").distinct()
    assert(centroidsProbe.join(ids, "n_id").count() == centroidsProbe.count())
  }

  test("near-dup pairs: sound (subset of brute force) and complete on planted pairs") {
    val got = SimilaritySearch.nearDupPairs(planted, tau = 0.99, tables = 32)
      .select("x_id", "y_id")
    val a = planted.select(col("vid").as("x_id"), col("emb").as("x_emb"))
    val b = planted.select(col("vid").as("y_id"), col("emb").as("y_emb"))
    val brute = a.crossJoin(b).filter(col("x_id") < col("y_id"))
      .withColumn("sim", SimilaritySearch.cosine(col("x_emb"), col("y_emb")))
      .filter(col("sim") >= 0.99)
      .select("x_id", "y_id")
    assert(got.exceptAll(brute).isEmpty, "reported a pair brute force rejects")
    assert(brute.exceptAll(got).isEmpty, "missed a planted pair")
    assert(got.count() == emb.count()) // exactly one pair per planted copy
  }

  test("semantic dedup equals the naive within-cell brute force on the planted corpus") {
    val got = SimilaritySearch.semanticDedup(planted, tau = 0.99, nCells = 16)

    // naive mirror: same MD5-ordered centroids + best-cosine assignment
    // (smaller cell on ties), then all-pairs per cell
    val idHash = md5(col("c_src").cast("string"))
    val centroids = planted
      .select(col("vid").as("c_src"), col("emb").as("c_emb"))
      .orderBy(md5(col("c_src").cast("string")), col("c_src"))
      .limit(16)
      .withColumn(
        "cell",
        row_number().over(
          org.apache.spark.sql.expressions.Window.orderBy(idHash, col("c_src"))))
      .select("cell", "c_emb")
    val assigned = planted
      .crossJoin(broadcast(centroids))
      .withColumn("csim", SimilaritySearch.cosine(col("emb"), col("c_emb")))
      .withColumn(
        "rn",
        row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy("vid")
            .orderBy(col("csim").desc, col("cell"))))
      .filter(col("rn") === 1)
      .select(col("vid"), col("emb"), col("cell"))
    val x = assigned.select(col("vid").as("x_id"), col("emb").as("x_emb"), col("cell"))
    val yv = assigned.select(col("vid").as("y_id"), col("emb").as("y_emb"), col("cell"))
    val expected = assigned.select("vid")
      .join(
        x.join(yv, Seq("cell"))
          .filter(col("y_id") < col("x_id") &&
            SimilaritySearch.cosine(col("x_emb"), col("y_emb")) >= 0.99)
          .groupBy("x_id").agg(min("y_id").as("exp_dup")),
        col("vid") === col("x_id"), "left")
      .select(col("vid"), coalesce(col("exp_dup"), lit(-1L)).as("dup_of"))

    assert(got.count() == expected.count())
    assert(got.exceptAll(expected).isEmpty && expected.exceptAll(got).isEmpty)
    // planted near-copies quantize into their original's cell, so most
    // copies are caught (cell-boundary splits are the documented miss mode)
    assert(got.filter(col("dup_of") >= 0).count() > 0)
  }

  test("hard negatives: planted near-duplicates are excluded, hardest genuines kept") {
    import spark.implicits._
    // plant a near-copy of each anchor into the corpus: a naive top-k
    // would return it at rank 1; the miner must drop it
    val planted = emb.filter(col("vec_id") < 5).select(
      (col("vec_id") + 10000).as("n_id"),
      zip_with(
        col("embedding"),
        sequence(lit(0), lit(63)),
        (x, i) =>
          (x.cast("double") +
            when(pmod(i, lit(2)) === 0, lit(0.003)).otherwise(lit(-0.003)))
            .cast("float")).as("n_emb"))
    val anchors = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val got = SimilaritySearch.hardNegatives(
      anchors, corpus.unionByName(planted), k = 10, tauDup = 0.99)
    assert(got.filter(col("n_id") >= 10000).isEmpty, "planted dups must be excluded")
    assert(got.groupBy("q_id").count().filter(col("count") =!= 10).isEmpty)
    // with the dup gate above every natural similarity, the miner IS the
    // exact top-k: equality against bruteForceTopK on the clean corpus
    val viaBrute = SimilaritySearch.bruteForceTopK(anchors, corpus, 10)
      .select("q_id", "n_id", "rank")
    val gotClean = SimilaritySearch.hardNegatives(anchors, corpus, 10, tauDup = 2.0)
      .select("q_id", "n_id", "rank")
    assert(gotClean.exceptAll(viaBrute).isEmpty && viaBrute.exceptAll(gotClean).isEmpty)
  }

  test("mean pooling: hand-computed grid values, negatives, order-invariance") {
    import spark.implicits._
    // scaleBits = 2 → grid 4: 0.5 → 2, -0.75 → floor(-3+0.5) = -3, 1.0 → 4
    val rows = Seq(
      (1L, Seq(0.5f, -0.75f)),
      (1L, Seq(1.0f, -0.75f)),
      (2L, Seq(-0.75f, 0.5f))).toDF("gid", "emb")
    val got = SimilaritySearch.meanPoolQuantized(rows, scaleBits = 2)
      .orderBy("gid", "dim")
      .as[(Long, Long, Long, Long)].collect().toSeq
    // g1 d0: (2 + 4) div 2 = 3; g1 d1: (-3 + -3) div 2 = -3
    assert(got == Seq(
      (1L, 0L, 2L, 3L), (1L, 1L, 2L, -3L),
      (2L, 0L, 1L, -3L), (2L, 1L, 1L, 2L)))
    // bit-identical under any partitioning/aggregation order
    val grouped = emb.select(
      org.apache.spark.sql.functions.expr("vec_id div 4").as("gid"),
      col("embedding").as("emb"))
    val a = SimilaritySearch.meanPoolQuantized(grouped).orderBy("gid", "dim").collect().toSeq
    val b = SimilaritySearch.meanPoolQuantized(grouped.repartition(13))
      .orderBy("gid", "dim").collect().toSeq
    assert(a == b)
  }

  test("JL sign matrix replays through SQL md5 (the oracle's derivation)") {
    import spark.implicits._
    val cells = for (i <- 0 until 8; j <- 0 until 8) yield (i, j)
    val sql = cells.toDF("i", "j")
      .select(
        col("i"), col("j"),
        expr("""CASE WHEN (instr('0123456789abcdef',
                          substr(md5(concat(cast(i AS STRING), ':', cast(j AS STRING))), 1, 1)) - 1)
                          % 2 = 1 THEN 1L ELSE -1L END""").as("s"))
      .as[(Int, Int, Long)].collect()
    sql.foreach { case (i, j, s) =>
      assert(SimilaritySearch.jlSign(i, j) == s, s"sign($i,$j)")
    }
    // and the matrix is not degenerate (both signs occur)
    assert(sql.map(_._3).distinct.sorted.toSeq == Seq(-1L, 1L))
  }

  test("signProject: hand-computed projection, partition invariance") {
    import spark.implicits._
    val df = Seq((1L, Seq(0.5f, -0.25f, 1.0f))).toDF("id", "e")
    val got = SimilaritySearch.signProject(df, "id", "e", dim = 3, outDims = 2, scaleBits = 2)
      .select("proj").head().getSeq[Long](0)
    val q = Seq(2L, -1L, 4L) // round(x * 4)
    val expect = (0 until 2).map { j =>
      (0 until 3).map(i => q(i) * SimilaritySearch.jlSign(i, j)).sum
    }
    assert(got == expect)
    val base = emb.select(col("vec_id").as("id"), col("embedding").as("e"))
    val a = SimilaritySearch.signProject(base, "id", "e", 64, 16)
      .orderBy("id").collect().toSeq
    val b = SimilaritySearch.signProject(base.repartition(13), "id", "e", 64, 16)
      .orderBy("id").collect().toSeq
    assert(a == b)
  }

  test("JL projection preserves planted structure: projected top-1 is the near-copy") {
    // near-identical vectors stay near-identical under ANY linear map —
    // the projected cosine of a planted copy is ~1 while unrelated
    // near-random vectors project near-orthogonally, so even 16 of 64
    // dims must put every planted copy at rank 1.
    val qs = planted.filter(col("vid") >= 10000 && col("vid") < 10020)
      .select(col("vid").as("q_id"), col("emb").as("q_emb"))
    val corp = planted.filter(col("vid") < 10000)
      .select(col("vid").as("n_id"), col("emb").as("n_emb"))
    val pq = SimilaritySearch.signProject(qs, "q_id", "q_emb", 64, 16)
      .select(col("q_id"), col("proj").as("q_proj"))
    val pc = SimilaritySearch.signProject(corp, "n_id", "n_emb", 64, 16)
      .select(col("n_id"), col("proj").as("n_proj"))
    val scored = pc.crossJoin(broadcast(pq))
      .withColumn("psim", SimilaritySearch.projCosine(col("q_proj"), col("n_proj")))
    val top1 = graft.operators.TopK
      .perGroup(scored, Seq("q_id"), Seq(col("psim").desc, col("n_id")), 1, rankCol = "rank")
    import spark.implicits._
    val got = top1.select("q_id", "n_id").as[(Long, Long)].collect().toMap
    (10000L until 10020L).foreach { q =>
      assert(got.get(q).contains(q - 10000), s"query $q projected-top1 ${got.get(q)}")
    }
  }

  test("jlRecall: perfect on planted copies; recall grows with outDims on the natural corpus") {
    // planted: each query's exact top-1 IS its copy and the projected
    // ranking must recover it — recall@1 = 10000 bp for every query
    val qs = planted.filter(col("vid") >= 10000 && col("vid") < 10010)
      .select(col("vid").as("q_id"), col("emb").as("q_emb"))
    val corp = planted.filter(col("vid") < 10000)
      .select(col("vid").as("n_id"), col("emb").as("n_emb"))
    val cert = SimilaritySearch.jlRecall(qs, corp, 64, 16, k = 1).collect()
    assert(cert.length == 10)
    cert.foreach(r => assert(r.getAs[Long]("recall_bp") == 10000L, r.toString))
    // natural corpus: more projected dims → (weakly) better total recall,
    // and full-width projection beats a 4-dim one decisively
    val q10 = queries.limit(10)
    def total(outDims: Int): Long =
      SimilaritySearch.jlRecall(q10, corpus, 64, outDims, k = 10)
        .agg(sum("n_hit")).head().getLong(0)
    val r4 = total(4)
    val r48 = total(48)
    assert(r48 > r4, s"recall at 48 dims ($r48) should beat 4 dims ($r4)")
  }
}
