package graft

import org.apache.spark.sql.functions.{col, expr, lit, pmod}

import graft.core.Tables
import graft.operators.SimilarityJoin

/** The SQL surface installed by GraftExtensions (SparkSpec builds the
  * session with `spark.sql.extensions=graft.GraftExtensions`).
  */
class GraftExtensionsSpec extends SparkSpec {
  init()

  test("similarity_join TVF round-trips to the Scala prefix self-join exactly") {
    Tables(spark, sfSmoke, "documents").createOrReplaceTempView("sj_docs")
    val viaSql = spark.sql(
      "SELECT * FROM similarity_join('sj_docs', 'doc_id', 'text', 0.8)")
    val viaScala = SimilarityJoin.prefixSelfJoin(
      Tables(spark, sfSmoke, "documents"), "doc_id", "text", 0.8)
    assert(viaSql.columns.toSeq == viaScala.columns.toSeq)
    assert(viaSql.count() == viaScala.count())
    assert(viaSql.exceptAll(viaScala).isEmpty && viaScala.exceptAll(viaSql).isEmpty)
  }

  test("similarity_join TVF composes downstream: aggregation over the join") {
    Tables(spark, sfSmoke, "documents").createOrReplaceTempView("sj_docs2")
    val n = spark.sql(
      """SELECT count(*) AS n
        |FROM similarity_join('sj_docs2', 'doc_id', 'text', 0.8)
        |WHERE jacc >= 0.9""".stripMargin).collect()(0).getLong(0)
    val expected = SimilarityJoin.prefixSelfJoin(
        Tables(spark, sfSmoke, "documents"), "doc_id", "text", 0.8)
      .filter("jacc >= 0.9").count()
    assert(n == expected)
  }

  test("containment_join TVF round-trips to the Scala containment self-join exactly") {
    Tables(spark, sfSmoke, "documents").createOrReplaceTempView("cj_docs")
    val viaSql = spark.sql(
      "SELECT * FROM containment_join('cj_docs', 'doc_id', 'text', 0.9)")
    val viaScala = SimilarityJoin.containmentSelfJoin(
      Tables(spark, sfSmoke, "documents"), "doc_id", "text", 0.9)
    assert(viaSql.columns.toSeq == viaScala.columns.toSeq)
    assert(viaSql.count() == viaScala.count())
    assert(viaSql.exceptAll(viaScala).isEmpty && viaScala.exceptAll(viaSql).isEmpty)
  }

  test("asof_join TVF round-trips to the Scala backward as-of join exactly") {
    import org.apache.spark.sql.functions._
    val ev = Tables(spark, sfSmoke, "events")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"), col("ts"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("user_id"), col("ts"),
        col("value").as("view_value"))
    clicks.createOrReplaceTempView("aj_clicks")
    views.createOrReplaceTempView("aj_views")
    val viaSql = spark.sql(
      "SELECT * FROM asof_join('aj_clicks', 'aj_views', 'user_id', 'ts', 'view_id')")
    val viaScala = graft.operators.AsOfJoin
      .backward(clicks, views, Seq("user_id"), "ts", tiebreak = "view_id")
    assert(viaSql.columns.toSeq == viaScala.columns.toSeq)
    assert(viaSql.exceptAll(viaScala).isEmpty && viaScala.exceptAll(viaSql).isEmpty)
  }

  test("range_join TVF round-trips to the Scala time-range join exactly") {
    import org.apache.spark.sql.functions._
    val ev = Tables(spark, sfSmoke, "events")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"),
        unix_micros(col("ts")).as("tus"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("user_id"),
        unix_micros(col("ts")).as("vus"))
    clicks.createOrReplaceTempView("rj_clicks")
    views.createOrReplaceTempView("rj_views")
    val viaSql = spark.sql(
      "SELECT * FROM range_join('rj_clicks', 'rj_views', 'user_id', 'tus', 'vus', " +
        "-3600000000, 0)")
    val viaScala = graft.operators.RangeJoin.timeRange(
      clicks, views, Seq("user_id"), "tus", "vus", lower = -3600L * 1000 * 1000, upper = 0L)
    assert(viaSql.columns.toSeq == viaScala.columns.toSeq)
    assert(viaSql.exceptAll(viaScala).isEmpty && viaScala.exceptAll(viaSql).isEmpty)
  }

  test("7-arg similarity_join / containment_join TVFs run the two-table (R-S) forms") {
    import org.apache.spark.sql.functions._
    val docs = Tables(spark, sfSmoke, "documents")
    val probe = docs.filter(col("doc_id") % 2 === 0)
    val index = docs.filter(col("doc_id") % 2 === 1)
    probe.createOrReplaceTempView("rs_probe")
    index.createOrReplaceTempView("rs_index")
    val pToks = SimilarityJoin.tokenize(probe, "doc_id", "text")
    val iToks = SimilarityJoin.tokenize(index, "doc_id", "text")

    val sjSql = spark.sql(
      "SELECT * FROM similarity_join('rs_probe', 'doc_id', 'text', 'rs_index', 'doc_id', 'text', 0.8)")
    val sjScala = SimilarityJoin.prefixJoin(pToks, iToks, 0.8)
    assert(sjSql.columns.toSeq == sjScala.columns.toSeq)
    assert(sjSql.exceptAll(sjScala).isEmpty && sjScala.exceptAll(sjSql).isEmpty)

    val cjSql = spark.sql(
      "SELECT * FROM containment_join('rs_probe', 'doc_id', 'text', 'rs_index', 'doc_id', 'text', 0.9)")
    val cjScala = SimilarityJoin.containmentJoin(pToks, iToks, 0.9)
    assert(cjSql.columns.toSeq == cjScala.columns.toSeq)
    assert(cjSql.exceptAll(cjScala).isEmpty && cjScala.exceptAll(cjSql).isEmpty)
  }

  test("redact_pii TVF round-trips to the Scala redaction exactly") {
    Tables(spark, sfSmoke, "documents").createOrReplaceTempView("pii_docs")
    val viaSql = spark.sql("SELECT * FROM redact_pii('pii_docs', 'doc_id', 'text')")
    val viaScala = graft.operators.TextAnalysis.redactPii(
      Tables(spark, sfSmoke, "documents"), "doc_id", "text")
    assert(viaSql.columns.toSeq == viaScala.columns.toSeq)
    assert(viaSql.exceptAll(viaScala).isEmpty && viaScala.exceptAll(viaSql).isEmpty)
  }

  test("keyword_topk TVF round-trips to the Scala retrieval exactly") {
    Tables(spark, sfSmoke, "documents").createOrReplaceTempView("kw_docs")
    val viaSql = spark.sql(
      "SELECT * FROM keyword_topk('kw_docs', 'doc_id', 'text', 'spark, vector', 10)")
    val viaScala = graft.operators.KeywordSearch.topK(
      Tables(spark, sfSmoke, "documents"), "doc_id", "text", Seq("spark", "vector"), 10)
    assert(viaSql.columns.toSeq == viaScala.columns.toSeq)
    // ordered output: compare as sequences
    assert(viaSql.collect().toSeq == viaScala.collect().toSeq)
  }

  test("weighted_sample TVF round-trips to the Scala sampler exactly") {
    Tables(spark, sfSmoke, "documents").createOrReplaceTempView("ws_docs")
    val viaSql = spark.sql(
      "SELECT * FROM weighted_sample('ws_docs', 'doc_id', 'source', 'src0:0.9, src1:0.6', 0.15)")
    val viaScala = graft.operators.Sampling.weightedSample(
      Tables(spark, sfSmoke, "documents"), "doc_id", "source",
      Seq("src0" -> 0.9, "src1" -> 0.6), defaultRate = 0.15)
    assert(viaSql.columns.toSeq == viaScala.columns.toSeq)
    assert(viaSql.exceptAll(viaScala).isEmpty && viaScala.exceptAll(viaSql).isEmpty)
    val bad = intercept[IllegalArgumentException](
      spark.sql("SELECT * FROM weighted_sample('ws_docs', 'doc_id', 'source', 'src0=0.9', 0.15)"))
    assert(bad.getMessage.contains("stratum:rate"))
  }

  test("minhash_dedup TVF round-trips to the Scala cluster labeling exactly") {
    Tables(spark, sfSmoke, "documents").createOrReplaceTempView("md_docs")
    val viaSql = spark.sql(
      "SELECT * FROM minhash_dedup('md_docs', 'doc_id', 'text', 0.8)")
    val viaScala = graft.operators.Dedup.minhashDedup(
      SimilarityJoin.tokenize(Tables(spark, sfSmoke, "documents"), "doc_id", "text"), 0.8)
    assert(viaSql.columns.toSeq == viaScala.columns.toSeq)
    assert(viaSql.exceptAll(viaScala).isEmpty && viaScala.exceptAll(viaSql).isEmpty)
  }

  test("semantic_dedup TVF round-trips to the Scala SemDeDup pass exactly") {
    import org.apache.spark.sql.functions._
    Tables(spark, sfSmoke, "embeddings").createOrReplaceTempView("sd_emb")
    val viaSql = spark.sql(
      "SELECT * FROM semantic_dedup('sd_emb', 'vec_id', 'embedding', 0.985, 64)")
    val viaScala = graft.operators.SimilaritySearch.semanticDedup(
      Tables(spark, sfSmoke, "embeddings")
        .select(col("vec_id").as("vid"), col("embedding").as("emb")),
      tau = 0.985, nCells = 64)
    assert(viaSql.columns.toSeq == viaScala.columns.toSeq)
    assert(viaSql.exceptAll(viaScala).isEmpty && viaScala.exceptAll(viaSql).isEmpty)
    // composes downstream like a relation
    val kept = spark.sql(
      "SELECT count(*) AS n FROM semantic_dedup('sd_emb', 'vec_id', 'embedding', 0.985, 64) WHERE dup_of = -1")
      .collect()(0).getLong(0)
    assert(kept == viaScala.filter(col("dup_of") === -1).count())
  }

  test("decontaminate TVF round-trips to the Scala flag pass exactly") {
    import org.apache.spark.sql.functions._
    val docs = Tables(spark, sfSmoke, "documents")
    docs.filter(col("doc_id") % 50 =!= 0).createOrReplaceTempView("dc_corpus")
    docs.filter(col("doc_id") % 50 === 0).createOrReplaceTempView("dc_eval")
    val viaSql = spark.sql(
      "SELECT * FROM decontaminate('dc_corpus', 'doc_id', 'text', 'dc_eval', 'doc_id', 'text', 5)")
    val viaScala = graft.operators.Decontamination
      .flagWithinTable(spark, docs, "doc_id", "text", 5, 50)
    assert(viaSql.columns.toSeq == viaScala.columns.toSeq)
    assert(viaSql.exceptAll(viaScala).isEmpty && viaScala.exceptAll(viaSql).isEmpty)
  }

  test("ann_topk TVF round-trips to the Scala ANN paths exactly") {
    import org.apache.spark.sql.functions._
    val emb = Tables(spark, sfSmoke, "embeddings")
    emb.createOrReplaceTempView("ann_emb")
    emb.filter(col("vec_id") < 10).createOrReplaceTempView("ann_q")
    val queries = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val corpus = emb.select(col("vec_id").as("n_id"), col("embedding").as("n_emb"))
    for (method <- Seq("brute", "lsh", "ivf")) {
      val viaSql = spark.sql(
        s"SELECT * FROM ann_topk('ann_q', 'vec_id', 'embedding', 'ann_emb', 'vec_id', 'embedding', 5, '$method')")
      val viaScala = method match {
        case "brute" => graft.operators.SimilaritySearch.bruteForceTopK(queries, corpus, 5)
        case "lsh" => graft.operators.SimilaritySearch.lshTopK(queries, corpus, 5)
        case "ivf" => graft.operators.SimilaritySearch.ivfTopK(queries, corpus, 5)
      }
      assert(viaSql.columns.toSeq == viaScala.columns.toSeq, method)
      assert(
        viaSql.exceptAll(viaScala).isEmpty && viaScala.exceptAll(viaSql).isEmpty,
        method)
    }
    val err = intercept[Exception] {
      spark.sql(
        "SELECT * FROM ann_topk('ann_q', 'vec_id', 'embedding', 'ann_emb', 'vec_id', 'embedding', 5, 'faiss')")
        .collect()
    }
    assert(err.getMessage.contains("brute/lsh/ivf"), err.getMessage)
  }

  test("subsequence_match TVF round-trips to the Scala matchED exactly") {
    import org.apache.spark.sql.functions._
    val series = graft.queries.SeqMatchQueries.deltaSeries(Tables(spark, sfSmoke, "events"))
    series.createOrReplaceTempView("sm_series")
    series.filter(col("idx") >= 200 && col("idx") < 250)
      .select((col("idx") - 200).as("idx"), col("v"))
      .createOrReplaceTempView("sm_query")
    val viaSql = spark.sql(
      "SELECT * FROM subsequence_match('sm_series', 'sm_query', 'ed', 6.5, 0, 3.0, 10.0)")
    val q = series.filter(col("idx") >= 200 && col("idx") < 250)
      .orderBy("idx").select("v").collect().map(_.getDouble(0))
    val viaScala = graft.operators.SubsequenceMatch.matchED(
      series, graft.operators.SubsequenceMatch.meanIndex(series), q, 6.5)
    assert(viaSql.columns.toSeq == viaScala.columns.toSeq)
    assert(viaSql.exceptAll(viaScala).isEmpty && viaScala.exceptAll(viaSql).isEmpty)
    assert(viaSql.count() > 0) // the self-match at start=200 always survives
  }

  test("similarity_join TVF rejects a non-literal table argument") {
    val e = intercept[Exception] {
      spark.sql("SELECT * FROM similarity_join(1, 'a', 'b', 0.8)").collect()
    }
    assert(e.getMessage.contains("string literal"), e.getMessage)
  }

  test("pack_sequences TVF round-trips to the Scala packing exactly") {
    Tables(spark, sfSmoke, "documents").createOrReplaceTempView("pack_docs")
    val viaSql = spark.sql("SELECT * FROM pack_sequences('pack_docs', 'doc_id', 'text', 128, 8)")
    val viaScala = graft.operators.Packing.packSpans(
      Tables(spark, sfSmoke, "documents"), "doc_id", "text", 128, 8)
    assert(viaSql.columns.toSeq == viaScala.columns.toSeq)
    assert(viaSql.exceptAll(viaScala).isEmpty && viaScala.exceptAll(viaSql).isEmpty)
  }

  test("block_dedup TVF round-trips to the Scala dedup exactly") {
    Tables(spark, sfSmoke, "documents").createOrReplaceTempView("bd_docs")
    val viaSql = spark.sql("SELECT * FROM block_dedup('bd_docs', 'doc_id', 'text', 8)")
    val viaScala = graft.operators.BlockDedup.dedup(
      Tables(spark, sfSmoke, "documents"), "doc_id", "text", 8)
    assert(viaSql.columns.toSeq == viaScala.columns.toSeq)
    assert(viaSql.exceptAll(viaScala).isEmpty && viaScala.exceptAll(viaSql).isEmpty)
  }

  test("decontaminate_fuzzy TVF round-trips to the Scala flagFuzzy exactly") {
    val docs = Tables(spark, sfSmoke, "documents")
    docs.filter(pmod(col("doc_id"), lit(50)) === 0).createOrReplaceTempView("df_eval")
    docs.filter(pmod(col("doc_id"), lit(50)) =!= 0).createOrReplaceTempView("df_corpus")
    val viaSql = spark.sql(
      "SELECT * FROM decontaminate_fuzzy('df_corpus', 'doc_id', 'text', 'df_eval', 'doc_id', 'text', 0.8)")
    val viaScala = graft.operators.Decontamination.flagFuzzy(
      docs.filter(pmod(col("doc_id"), lit(50)) =!= 0), "doc_id", "text",
      docs.filter(pmod(col("doc_id"), lit(50)) === 0), "doc_id", "text", 0.8)
    assert(viaSql.columns.toSeq == viaScala.columns.toSeq)
    assert(viaSql.exceptAll(viaScala).isEmpty && viaScala.exceptAll(viaSql).isEmpty)
  }

  test("kmeans_assign TVF round-trips to the Scala Lloyd pass exactly") {
    Tables(spark, sfSmoke, "embeddings").createOrReplaceTempView("km_embs")
    val viaSql = spark.sql("SELECT * FROM kmeans_assign('km_embs', 'vec_id', 'embedding', 8, 2)")
    val viaScala = graft.operators.Clustering.kmeansAssign(
      Tables(spark, sfSmoke, "embeddings")
        .select(col("vec_id").as("vid"), col("embedding").as("emb")),
      8, 2)
    assert(viaSql.columns.toSeq == viaScala.columns.toSeq)
    assert(viaSql.exceptAll(viaScala).isEmpty && viaScala.exceptAll(viaSql).isEmpty)
  }

  test("exact_quantiles TVF round-trips to the Scala quantiles exactly") {
    Tables(spark, sfSmoke, "documents").createOrReplaceTempView("eq_docs")
    spark.sql("SELECT source, n_chars FROM eq_docs").createOrReplaceTempView("eq_vals")
    val viaSql = spark.sql(
      "SELECT * FROM exact_quantiles('eq_vals', 'source', 'n_chars', 'p50:1/2,p90:9/10')")
    val viaScala = graft.operators.Quantiles.exactQuantiles(
      spark.table("eq_vals"), "source", "n_chars", Seq(("p50", 1L, 2L), ("p90", 9L, 10L)))
    assert(viaSql.columns.toSeq == viaScala.columns.toSeq)
    assert(viaSql.exceptAll(viaScala).isEmpty && viaScala.exceptAll(viaSql).isEmpty)
  }

  test("hybrid_dedup TVF round-trips to the Scala hybrid pass exactly") {
    Tables(spark, sfSmoke, "documents").createOrReplaceTempView("hd_docs")
    Tables(spark, sfSmoke, "embeddings").createOrReplaceTempView("hd_embs")
    val viaSql = spark.sql(
      "SELECT * FROM hybrid_dedup('hd_docs', 'doc_id', 'text', 'hd_embs', 'vec_id', 'embedding', 0.8, 0.985)")
    val viaScala = graft.operators.Dedup.hybridDedup(
      SimilarityJoin.tokenize(Tables(spark, sfSmoke, "documents"), "doc_id", "text"),
      Tables(spark, sfSmoke, "embeddings")
        .select(col("vec_id").as("vid"), col("embedding").as("emb")),
      0.8, 0.985)
    assert(viaSql.columns.toSeq == viaScala.columns.toSeq)
    assert(viaSql.exceptAll(viaScala).isEmpty && viaScala.exceptAll(viaSql).isEmpty)
  }

  test("chunk_overlap TVF round-trips to the Scala chunking exactly") {
    Tables(spark, sfSmoke, "documents").createOrReplaceTempView("ck_docs")
    val viaSql = spark.sql(
      "SELECT * FROM chunk_overlap('ck_docs', 'doc_id', 'text', 64, 48)")
    val viaScala = graft.operators.Chunking.chunkSpans(
      Tables(spark, sfSmoke, "documents"), "doc_id", "text", 64, 48)
    assert(viaSql.columns.toSeq == viaScala.columns.toSeq)
    assert(viaSql.exceptAll(viaScala).isEmpty && viaScala.exceptAll(viaSql).isEmpty)
  }

  test("snapshot_diff TVF round-trips to the Scala diff exactly") {
    val docs = Tables(spark, sfSmoke, "documents")
    docs.filter(pmod(col("doc_id"), lit(7)) =!= 3).createOrReplaceTempView("sd_old")
    docs.filter(pmod(col("doc_id"), lit(9)) =!= 4).createOrReplaceTempView("sd_new")
    val viaSql = spark.sql(
      "SELECT * FROM snapshot_diff('sd_old', 'sd_new', 'doc_id', 'text')")
    val viaScala = graft.operators.SnapshotDiff.diff(
      spark.table("sd_old"), spark.table("sd_new"), "doc_id", Seq("text"))
    assert(viaSql.columns.toSeq == viaScala.columns.toSeq)
    assert(viaSql.exceptAll(viaScala).isEmpty && viaScala.exceptAll(viaSql).isEmpty)
  }

  test("training_order TVF round-trips to the Scala layout exactly") {
    Tables(spark, sfSmoke, "documents").createOrReplaceTempView("to_docs")
    val viaSql = spark.sql("SELECT * FROM training_order('to_docs', 'doc_id', 16)")
    val viaScala = graft.operators.Packing.trainingOrder(
      Tables(spark, sfSmoke, "documents"), "doc_id", 16)
    assert(viaSql.columns.toSeq == viaScala.columns.toSeq)
    assert(viaSql.exceptAll(viaScala).isEmpty && viaScala.exceptAll(viaSql).isEmpty)
  }

  test("wordpiece_encode resolves through the extensions in fresh sessions") {
    val fresh = spark.newSession()
    val got = fresh.sql(
      "SELECT wordpiece_encode(array('window'), array('wind','w'), array('ow','i','n','d')) AS p")
      .collect()(0).getSeq[String](0)
    assert(got == Seq("wind", "##ow"))
  }

  test("intersect_size resolves in fresh sessions through the extensions") {
    val fresh = spark.newSession()
    val got = fresh.sql(
      "SELECT intersect_size(array('a','b','c'), array('b','c','d')) AS n")
      .collect()(0).getInt(0)
    assert(got == 2)
  }

  test("connected_components TVF labels a two-component graph") {
    import spark.implicits._
    (1L to 6L).toDF("id").createOrReplaceTempView("cc_nodes")
    // components {1,2,3} (via 1-2, 2-3) and {5,6}; node 4 isolated
    Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("a", "b")
      .createOrReplaceTempView("cc_edges")
    val got = spark.sql(
      "SELECT * FROM connected_components('cc_nodes', 'id', 'cc_edges', 'a', 'b')")
      .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 4L), (5L, 5L), (6L, 5L)))
  }

  test("analytics TVF batch round-trips the Scala paths") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val ev = core.Tables(spark, sfSmoke, "events")
      .withColumn("tus", unix_micros(col("ts")))
    ev.createOrReplaceTempView("tvf_events")
    val docs = core.Tables(spark, sfSmoke, "documents")
    docs.createOrReplaceTempView("tvf_docs")

    def same(sql: String, scala: org.apache.spark.sql.DataFrame, sort: Seq[String]): Unit = {
      val a = spark.sql(sql).orderBy(sort.map(col): _*).collect().toSeq
      val b = scala.orderBy(sort.map(col): _*).collect().toSeq
      assert(a == b, s"TVF diverged: $sql")
      assert(a.nonEmpty, s"empty round-trip: $sql")
    }
    same(
      "SELECT * FROM retention_cohorts('tvf_events', 'user_id', 'ts', 'day', 1)",
      graft.operators.Cohorts.retention(ev, "user_id", "ts", "day", 1),
      Seq("cohort", "offset"))
    same(
      "SELECT * FROM funnel('tvf_events', 'user_id', 'tus', 'event_type', 'signup,view', 604800000000)",
      graft.operators.Funnel.analyze(ev, "user_id", "tus", "event_type",
        Seq("signup", "view"), 604800000000L),
      Seq("user_id"))
    same(
      "SELECT * FROM scd2_history('tvf_events', 'user_id', 'tus', 'event_id', 'event_type')",
      graft.operators.Scd.type2History(ev, "user_id", "tus", "event_id", Seq("event_type")),
      Seq("user_id", "valid_from"))
    val cents = ev.select(col("event_id"), col("event_type"),
      round(col("value") * 100).cast("long").as("cents"))
    cents.createOrReplaceTempView("tvf_cents")
    same(
      "SELECT * FROM mad_outliers('tvf_cents', 'event_type', 'cents', 3)",
      graft.operators.Anomaly.madOutliers(cents, "event_type", "cents", 3),
      Seq("event_id"))
    same(
      "SELECT * FROM collocations('tvf_docs', 'doc_id', 'text', 3, 10)",
      graft.operators.Collocations.topByLift(docs, "doc_id", "text", 3, 10),
      Seq("rk"))
    same(
      "SELECT * FROM hll_registers('tvf_docs', 'text', 5, 'source')",
      graft.operators.Hll.registers(docs, "text", 5, Seq("source")),
      Seq("source", "bucket"))
  }

  test("graph/interval/itemset/typo TVF batch round-trips the Scala paths") {
    import spark.implicits._
    Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)).toDF("a", "b")
      .createOrReplaceTempView("tvf_edges")
    val tri = spark.sql("SELECT * FROM triangles('tvf_edges', 'a', 'b')")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(tri == Seq((1L, 2L, 3L)))

    Seq((1L, 0L, 10L), (1L, 20L, 30L)).toDF("k", "ls", "le")
      .createOrReplaceTempView("tvf_l")
    Seq((1L, 5L, 25L)).toDF("k", "rs", "re").createOrReplaceTempView("tvf_r")
    val ov = spark.sql(
      "SELECT * FROM interval_overlap('tvf_l', 'tvf_r', 'k', 'ls', 'le', 'rs', 're', 7)")
      .count()
    assert(ov == 2L)

    Seq((1L, "a"), (1L, "b"), (2L, "a"), (2L, "b")).toDF("bid", "i")
      .createOrReplaceTempView("tvf_baskets")
    val ip = spark.sql("SELECT * FROM itemset_pairs('tvf_baskets', 'bid', 'i', 2)")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(ip == Seq(("a", "b")))

    Seq("spark", "sparc", "table").toDF("w").createOrReplaceTempView("tvf_words")
    val ed = spark.sql("SELECT * FROM edit_distance_join('tvf_words', 'w', 1)")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(ed == Seq(("sparc", "spark")))

    Seq(
      (1L, "t1 t2 t3 t4 alpha"),
      (2L, "beta t1 t2 t3 t4"),
      (3L, "unrelated text entirely here"))
      .toDF("doc_id", "text").createOrReplaceTempView("tvf_docs2")
    val rs = spark.sql("SELECT * FROM repeated_spans('tvf_docs2', 'doc_id', 'text', 3, 2)")
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(rs == Seq((1L, 0L, 3L), (2L, 1L, 4L)))
    val sr = spark.sql("SELECT * FROM span_removal('tvf_docs2', 'doc_id', 'text', 3, 2)")
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(sr == Seq(
      (1L, "t1 t2 t3 t4 alpha"),
      (2L, "beta"),
      (3L, "unrelated text entirely here")))

    val cc = spark.sql("SELECT * FROM clustering_coefficient('tvf_edges', 'a', 'b')")
      .orderBy("id")
      .collect().map(r => (r.getLong(0), r.getLong(3))).toSeq
    val ccScala = graft.operators.Triangles.clusteringCoefficient(spark.table("tvf_edges"))
      .orderBy("id")
      .collect().map(r => (r.getLong(0), r.getLong(3))).toSeq
    assert(cc == ccScala && cc.nonEmpty)

    Seq((10L, 1L), (11L, 2L), (12L, 3L)).toDF("id", "rk").createOrReplaceTempView("tvf_rank1")
    Seq((11L, 1L), (10L, 2L), (13L, 3L)).toDF("id", "rk").createOrReplaceTempView("tvf_rank2")
    val rrf = spark.sql(
      "SELECT * FROM rrf_fusion('tvf_rank1,tvf_rank2', 'id', 'rk', 60, 1000000, 3)")
      .orderBy("rk")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val rrfScala = graft.operators.Fusion.rrf(
        Seq(spark.table("tvf_rank1"), spark.table("tvf_rank2")),
        "id", "rk", 60L, 1000000L, 3)
      .orderBy("rk")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(rrf == rrfScala && rrf.size == 3)

    Seq(1L, 2L, 3L).toDF("id").createOrReplaceTempView("tvf_nodes")
    val pr = spark.sql(
      "SELECT * FROM pagerank('tvf_nodes', 'id', 'tvf_edges', 'a', 'b', 1)")
      .orderBy("id").collect().map(r => r.getLong(1)).toSeq
    val prScala = graft.operators.PageRank.ranks(
        spark.table("tvf_nodes"), spark.table("tvf_edges")
          .select(org.apache.spark.sql.functions.col("a"),
            org.apache.spark.sql.functions.col("b")), 1)
      .orderBy("id").collect().map(r => r.getLong(1)).toSeq
    assert(pr == prScala && pr.nonEmpty)
  }

  test("lm_buckets / bpe_train / bpe_encode TVFs round-trip the Scala paths") {
    import spark.implicits._
    Seq(
      (1L, "the cat sat the cat sat"),
      (2L, "the cat sat on a mat"),
      (3L, "rare words only here"),
      (4L, ""))
      .toDF("doc_id", "text").createOrReplaceTempView("tvf_docs_lm")
    val lb = spark.sql("SELECT * FROM lm_buckets('tvf_docs_lm', 'doc_id', 'text', 2)")
      .orderBy("doc_id").collect().toSeq
    val lbScala = graft.operators.LmScore
      .familiarityBuckets(spark.table("tvf_docs_lm"), "doc_id", "text", minCount = 2)
      .orderBy("doc_id").collect().toSeq
    assert(lb == lbScala && lb.size == 4)

    Seq(
      (1L, "low low low low low"),
      (2L, "lower lower"),
      (3L, "newest newest newest newest newest newest"),
      (4L, "widest widest widest"))
      .toDF("doc_id", "text").createOrReplaceTempView("tvf_docs_bpe")
    val bt = spark.sql("SELECT * FROM bpe_train('tvf_docs_bpe', 'text', 3)")
      .orderBy("step").collect().toSeq
    val btScala = graft.operators.BpeTrain
      .learnTable(spark, spark.table("tvf_docs_bpe"), "text", nMerges = 3)
      .orderBy("step").collect().toSeq
    assert(bt == btScala && bt.size == 3)

    val be = spark.sql("SELECT * FROM bpe_encode('tvf_docs_bpe', 'doc_id', 'text', 3)")
      .orderBy("doc_id").collect().toSeq
    val beScala = graft.operators.BpeTrain
      .encode(
        spark.table("tvf_docs_bpe"), "doc_id", "text",
        graft.operators.BpeTrain.learn(spark.table("tvf_docs_bpe"), "text", 3))
      .orderBy("doc_id").collect().toSeq
    assert(be == beScala && be.size == 4)
  }

  test("corpus_overlap / mixture TVFs round-trip the Scala paths") {
    import spark.implicits._
    Seq(
      ("s1", 1L, "the quick brown fox jumps over"),
      ("s1", 2L, "pack my box with five jugs"),
      ("s2", 3L, "the quick brown fox sleeps here"),
      ("s2", 4L, "totally different words appear now"))
      .toDF("source", "doc_id", "text").createOrReplaceTempView("tvf_docs_ov")
    val ov = spark.sql("SELECT * FROM corpus_overlap('tvf_docs_ov', 'source', 'text', 3)")
      .orderBy("src_a", "src_b").collect().toSeq
    val ovScala = graft.operators.CorpusOverlap
      .overlapMatrix(spark.table("tvf_docs_ov"), "source", "text", 3)
      .orderBy("src_a", "src_b").collect().toSeq
    assert(ov == ovScala && ov.nonEmpty)

    val mp = spark.sql("SELECT * FROM mixture_plan('tvf_docs_ov', 'source', 3)")
      .orderBy("source").collect().toSeq
    val mpScala = graft.operators.Sampling
      .mixturePlan(spark.table("tvf_docs_ov"), "source", 3L)
      .orderBy("source").collect().toSeq
    assert(mp == mpScala && mp.size == 2)

    val ts = spark.sql(
      "SELECT * FROM temperature_sample('tvf_docs_ov', 'source', 'doc_id', 3)")
      .orderBy("doc_id").collect().toSeq
    val tsScala = graft.operators.Sampling
      .temperatureSample(spark.table("tvf_docs_ov"), "source", "doc_id", 3L)
      .orderBy("doc_id").collect().toSeq
    assert(ts == tsScala && ts.nonEmpty)

    val dt = spark.sql(
      "SELECT * FROM distinctive_terms('tvf_docs_ov', 'source', 'text', 1, 5)")
      .orderBy("source", "rk").collect().toSeq
    val dtScala = graft.operators.Keyness
      .distinctiveTerms(spark.table("tvf_docs_ov"), "source", "text", 1, 5)
      .orderBy("source", "rk").collect().toSeq
    assert(dt == dtScala && dt.nonEmpty)
  }

  test("exact_auc / calibration_buckets TVFs round-trip the Scala paths") {
    import spark.implicits._
    Seq((10L, 1), (8L, 1), (8L, 0), (3L, 0), (-2L, 0), (7L, 1))
      .toDF("score", "y").createOrReplaceTempView("tvf_scores")
    val auc = spark.sql("SELECT * FROM exact_auc('tvf_scores', 'score', 'y')")
      .collect().toSeq
    val aucScala = graft.operators.ModelEval
      .exactAuc(spark.table("tvf_scores"), "score", "y").collect().toSeq
    assert(auc == aucScala && auc.size == 1)
    val cal = spark.sql(
      "SELECT * FROM calibration_buckets('tvf_scores', 'score', 'y', 3)")
      .orderBy("bucket").collect().toSeq
    val calScala = graft.operators.ModelEval
      .calibrationBuckets(spark.table("tvf_scores"), "score", "y", 3)
      .orderBy("bucket").collect().toSeq
    assert(cal == calScala && cal.nonEmpty)
  }

  test("kcore / personalized_pagerank / bfs_hops TVFs round-trip the Scala paths") {
    import spark.implicits._
    (1L to 7L).toDF("id").createOrReplaceTempView("tvf_g_nodes")
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (5L, 6L))
    (pairs ++ pairs.map(p => (p._2, p._1)))
      .toDF("a", "b").createOrReplaceTempView("tvf_g_edges")
    Seq(1L).toDF("id").createOrReplaceTempView("tvf_g_src")
    val kc = spark.sql(
      "SELECT * FROM kcore('tvf_g_nodes', 'id', 'tvf_g_edges', 'a', 'b', 2, 4)")
      .orderBy("id").collect().toSeq
    val kcScala = graft.operators.KCore
      .core(spark.table("tvf_g_nodes"), spark.table("tvf_g_edges"), 2, 4)
      .orderBy("id").collect().toSeq
    assert(kc == kcScala && kc.size == 3)
    val pp = spark.sql(
      """SELECT * FROM personalized_pagerank(
        |  'tvf_g_nodes', 'id', 'tvf_g_edges', 'a', 'b', 'tvf_g_src', 'id', 2)""".stripMargin)
      .orderBy("id").collect().toSeq
    val ppScala = graft.operators.PageRank
      .personalizedRanks(
        spark.table("tvf_g_nodes"), spark.table("tvf_g_edges"),
        spark.table("tvf_g_src"), 2)
      .orderBy("id").collect().toSeq
    assert(pp == ppScala && pp.size == 7)
    val bf = spark.sql(
      "SELECT * FROM bfs_hops('tvf_g_nodes', 'id', 'tvf_g_edges', 'a', 'b', 1, 4)")
      .orderBy("id").collect().toSeq
    val bfScala = graft.operators.Reachability
      .hopDistances(spark.table("tvf_g_nodes"), spark.table("tvf_g_edges"), 1L, 4)
      .orderBy("id").collect().toSeq
    assert(bf == bfScala && bf.size == 7)
  }

  test("quantize_int8 / quantized_ann TVFs round-trip the Scala paths") {
    import spark.implicits._
    Seq(
      (0L, Seq(1.0f, 0.5f, -0.25f)),
      (1L, Seq(0.9f, 0.6f, -0.2f)),
      (2L, Seq(-1.0f, 0.1f, 0.8f)),
      (3L, Seq(0.0f, 0.0f, 0.0f)))
      .toDF("vec_id", "embedding").createOrReplaceTempView("tvf_vecs")
    val qz = spark.sql("SELECT * FROM quantize_int8('tvf_vecs', 'vec_id', 'embedding')")
      .orderBy("vec_id").collect().toSeq
    val qzScala = graft.operators.SimilaritySearch
      .quantizeInt8(spark.table("tvf_vecs"), "vec_id", "embedding")
      .orderBy("vec_id").collect().toSeq
    assert(qz == qzScala && qz.size == 4)
    val ann = spark.sql(
      "SELECT * FROM quantized_ann('tvf_vecs', 'vec_id', 'embedding', 2, 2)")
      .orderBy("q_id", "rank").collect().toSeq
    val codes = graft.operators.SimilaritySearch
      .quantizeInt8(spark.table("tvf_vecs"), "vec_id", "embedding")
    val annScala = graft.operators.SimilaritySearch
      .quantizedTopK(
        codes.filter(col("vec_id") < 2)
          .select(col("vec_id").as("q_id"), col("codes").as("q_codes")),
        codes.select(col("vec_id").as("n_id"), col("codes").as("n_codes")),
        2)
      .orderBy("q_id", "rank").collect().toSeq
    assert(ann == annScala && ann.size == 4)
  }

  test("adaptive_salted_join TVF equals the plain join") {
    import spark.implicits._
    (1L to 500L).map(i => (if (i % 2 == 0) 3L else i % 5, s"p$i"))
      .toDF("k", "pv").createOrReplaceTempView("tvf_salt_probe")
    (0L to 4L).map(k => (k, s"b$k")).toDF("k", "bv")
      .createOrReplaceTempView("tvf_salt_build")
    val got = spark.sql(
      "SELECT * FROM adaptive_salted_join('tvf_salt_probe', 'tvf_salt_build', 'k', 100, 8)")
      .orderBy("k", "pv").collect().toSeq
    val want = spark.table("tvf_salt_probe")
      .join(spark.table("tvf_salt_build"), "k")
      .orderBy("k", "pv").collect().toSeq
    assert(got == want && got.nonEmpty)
  }

  test("label_propagation TVF round-trips the Scala path") {
    import spark.implicits._
    (1L to 8L).toDF("id").createOrReplaceTempView("tvf_lp_nodes")
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 1L), (5L, 6L), (6L, 7L), (7L, 5L), (3L, 5L))
    (pairs ++ pairs.map(p => (p._2, p._1)))
      .toDF("a", "b").createOrReplaceTempView("tvf_lp_edges")
    val lp = spark.sql(
      "SELECT * FROM label_propagation('tvf_lp_nodes', 'id', 'tvf_lp_edges', 'a', 'b', 3)")
      .orderBy("id").collect().toSeq
    val lpScala = graft.operators.LabelPropagation
      .propagate(
        spark.table("tvf_lp_nodes"),
        spark.table("tvf_lp_edges"), 3)
      .orderBy("id").collect().toSeq
    assert(lp == lpScala && lp.size == 8)
  }

  test("simhash64 / minhash_bands / lsh_signature resolve through the extensions") {
    val fresh = spark.newSession()
    val fp = fresh.sql("SELECT simhash64(array('a','b')) AS fp").collect()(0).getLong(0)
    val fp2 = spark.sql("SELECT simhash64(array('a','b')) AS fp").collect()(0).getLong(0)
    assert(fp == fp2) // deterministic across sessions
    val nBands = fresh.sql("SELECT size(minhash_bands(array('a','b'), 32, 3)) AS n")
      .collect()(0).getInt(0)
    assert(nBands == 32)
    val nTables = fresh.sql(
      "SELECT size(lsh_signature(CAST(array(0.1, -0.2) AS ARRAY<FLOAT>), 16, 8)) AS n")
      .collect()(0).getInt(0)
    assert(nTables == 16)
  }

  test("kanon_suppress / semantic_decon / tokenizer_fertility / lsh_recall TVFs round-trip") {
    val docs = Tables(spark, sfSmoke, "documents")
    val embs = Tables(spark, sfSmoke, "embeddings")

    docs.select("doc_id", "lang", "source").createOrReplaceTempView("ka_docs")
    val kaSql = spark.sql("SELECT * FROM kanon_suppress('ka_docs', 'lang,source', 5)")
    val kaScala = graft.operators.KAnonymity
      .suppress(docs.select("doc_id", "lang", "source"), Seq("lang", "source"), 5)
    assert(kaSql.columns.toSeq == kaScala.columns.toSeq)
    assert(kaSql.exceptAll(kaScala).isEmpty && kaScala.exceptAll(kaSql).isEmpty)

    embs.createOrReplaceTempView("sd_corpus")
    embs.filter(col("vec_id") < 10)
      .select((col("vec_id") + 10000).as("eval_id"), col("embedding").as("eval_emb"))
      .createOrReplaceTempView("sd_eval")
    for (cells <- Seq(0, 16)) {
      val sdSql = spark.sql(
        "SELECT * FROM semantic_decon('sd_corpus', 'vec_id', 'embedding', " +
          s"'sd_eval', 'eval_id', 'eval_emb', 0.99, $cells)")
      val sdScala =
        if (cells == 0)
          graft.operators.Decontamination.flagSemantic(
            embs, "vec_id", "embedding", spark.table("sd_eval"), "eval_id", "eval_emb", 0.99)
        else
          graft.operators.Decontamination.flagSemanticCells(
            embs, "vec_id", "embedding", spark.table("sd_eval"), "eval_id", "eval_emb",
            0.99, cells)
      assert(sdSql.columns.toSeq == sdScala.columns.toSeq)
      assert(sdSql.exceptAll(sdScala).isEmpty && sdScala.exceptAll(sdSql).isEmpty)
    }

    docs.createOrReplaceTempView("tf_docs")
    val tfSql = spark.sql(
      "SELECT * FROM tokenizer_fertility('tf_docs', 'doc_id', 'text', 'lang', 4)")
    val tfScala = graft.operators.BpeTrain.fertility(
      docs, "doc_id", "text", "lang",
      graft.operators.BpeTrain.learn(docs, "text", 4))
    assert(tfSql.columns.toSeq == tfScala.columns.toSeq)
    assert(tfSql.exceptAll(tfScala).isEmpty && tfScala.exceptAll(tfSql).isEmpty)

    docs.createOrReplaceTempView("lr_docs")
    val lrSql = spark.sql(
      "SELECT * FROM lsh_recall('lr_docs', 'doc_id', 'text', 0.8, 32, 3, 250)")
    val lrScala = graft.operators.Dedup.lshRecallCertificate(
      SimilarityJoin.tokenize(docs, "doc_id", "text"),
      0.8, 32, 3, 250, maxQuadBucket = Int.MaxValue)
    assert(lrSql.columns.toSeq == lrScala.columns.toSeq)
    assert(lrSql.exceptAll(lrScala).isEmpty && lrScala.exceptAll(lrSql).isEmpty)
  }

  test("crosslm_buckets / hard_negatives / epoch_order TVFs round-trip") {
    val docs = Tables(spark, sfSmoke, "documents")
    val embs = Tables(spark, sfSmoke, "embeddings")

    docs.createOrReplaceTempView("cl_docs")
    docs.filter(col("lang") === "en").createOrReplaceTempView("cl_ref")
    val clSql = spark.sql(
      "SELECT * FROM crosslm_buckets('cl_docs', 'doc_id', 'text', 'cl_ref', 'text', 5)")
    val clScala = graft.operators.LmScore.familiarityBucketsAgainst(
      docs, "doc_id", "text", docs.filter(col("lang") === "en"), "text", 5)
    assert(clSql.columns.toSeq == clScala.columns.toSeq)
    assert(clSql.exceptAll(clScala).isEmpty && clScala.exceptAll(clSql).isEmpty)

    embs.createOrReplaceTempView("hn_corpus")
    embs.filter(col("vec_id") < 5).createOrReplaceTempView("hn_queries")
    val hnSql = spark.sql(
      "SELECT * FROM hard_negatives('hn_queries', 'vec_id', 'embedding', " +
        "'hn_corpus', 'vec_id', 'embedding', 5, 0.99)")
    val hnScala = graft.operators.SimilaritySearch.hardNegatives(
      embs.filter(col("vec_id") < 5)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb")),
      embs.select(col("vec_id").as("n_id"), col("embedding").as("n_emb")),
      5, 0.99)
    assert(hnSql.columns.toSeq == hnScala.columns.toSeq)
    assert(hnSql.exceptAll(hnScala).isEmpty && hnScala.exceptAll(hnSql).isEmpty)

    docs.createOrReplaceTempView("eo_docs")
    val eoSql = spark.sql("SELECT * FROM epoch_order('eo_docs', 'doc_id', 16, 3)")
    val eoScala = graft.operators.Packing.epochOrder(docs, "doc_id", 16, 3)
    assert(eoSql.columns.toSeq == eoScala.columns.toSeq)
    assert(eoSql.exceptAll(eoScala).isEmpty && eoScala.exceptAll(eoSql).isEmpty)

    graft.operators.Multimodal.mediaFromDocuments(docs).createOrReplaceTempView("ph_media")
    val phSql = spark.sql("SELECT * FROM phash_pairs('ph_media', 'media_id', 'payload', 3)")
    val phScala = graft.operators.Multimodal.phashPairs(
      graft.operators.Multimodal.mediaFromDocuments(docs), 3)
    assert(phSql.columns.toSeq == phScala.columns.toSeq)
    // set compare on the driver: exceptAll over this plan trips a Spark
    // attribute-binding bug (dropDuplicates + carried non-key column)
    def phSet(d: org.apache.spark.sql.DataFrame) = d.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getAs[Number](2).longValue)).toSet
    assert(phSet(phSql) == phSet(phScala) && phSet(phSql).nonEmpty)

    val cdcSql = spark.sql("SELECT * FROM cdc_fingerprint('ph_media', 'media_id', 'payload', 8)")
    val cdcScala = graft.operators.Multimodal.cdcFingerprint(
      graft.operators.Multimodal.mediaFromDocuments(docs), 8)
    assert(cdcSql.columns.toSeq == cdcScala.columns.toSeq)
    assert(cdcSql.exceptAll(cdcScala).isEmpty && cdcScala.exceptAll(cdcSql).isEmpty)

    val (cents, _) = graft.operators.SimilaritySearch.buildIvfIndex(
      embs.filter(col("vec_id") >= 200)
        .select(col("vec_id").as("n_id"), col("embedding").as("n_emb")), 16)
    cents.createOrReplaceTempView("iu_cents")
    embs.filter(col("vec_id") < 20).createOrReplaceTempView("iu_adds")
    val iuSql = spark.sql(
      "SELECT * FROM ivf_upsert('iu_cents', 'iu_adds', 'vec_id', 'embedding')")
    val iuScala = graft.operators.SimilaritySearch.upsertIvfIndex(
      spark.table("iu_cents"),
      embs.filter(col("vec_id") < 20)
        .select(col("vec_id").as("n_id"), col("embedding").as("n_emb")))
    assert(iuSql.columns.toSeq == iuScala.columns.toSeq)
    assert(iuSql.exceptAll(iuScala).isEmpty && iuScala.exceptAll(iuSql).isEmpty)

    embs.select(expr("vec_id div 4").as("g"), col("embedding").as("e"))
      .createOrReplaceTempView("mp_embs")
    val mpSql = spark.sql("SELECT * FROM mean_pool('mp_embs', 'g', 'e', 20)")
    val mpScala = graft.operators.SimilaritySearch.meanPoolQuantized(
      embs.select(expr("vec_id div 4").as("gid"), col("embedding").as("emb")), 20)
    assert(mpSql.columns.toSeq == mpScala.columns.toSeq)
    assert(mpSql.exceptAll(mpScala).isEmpty && mpScala.exceptAll(mpSql).isEmpty)

    embs.createOrReplaceTempView("sp_embs")
    val spSql = spark.sql("SELECT * FROM sign_project('sp_embs', 'vec_id', 'embedding', 64, 16, 14)")
    val spScala = graft.operators.SimilaritySearch
      .signProject(embs, "vec_id", "embedding", 64, 16, 14)
    assert(spSql.columns.toSeq == spScala.columns.toSeq)
    assert(spSql.exceptAll(spScala).isEmpty && spScala.exceptAll(spSql).isEmpty)

    val dtEvents = graft.core.Tables(spark, sfSmoke, "events")
      .select(col("user_id"), expr("unix_micros(ts) div 1000000").as("tsec"))
    dtEvents.createOrReplaceTempView("dt_events")
    val dtAsOf = dtEvents.agg(org.apache.spark.sql.functions.max("tsec")).head().getLong(0)
    val dtSql = spark.sql(
      s"SELECT * FROM decayed_topk('dt_events', 'user_id', 'tsec', $dtAsOf, 86400, 14, 5)")
    val dtScala = graft.operators.Decay
      .decayedTopK(dtEvents, Seq("user_id"), "tsec", dtAsOf, 86400L, 14, 5)
    assert(dtSql.columns.toSeq == dtScala.columns.toSeq)
    assert(dtSql.exceptAll(dtScala).isEmpty && dtScala.exceptAll(dtSql).isEmpty)

    docs.select(col("doc_id"), col("lang"),
        org.apache.spark.sql.functions.substring(col("text"), 1, 1).as("pred"))
      .createOrReplaceTempView("ck_rated")
    val ckSql = spark.sql("SELECT * FROM cohen_kappa('ck_rated', 'lang', 'pred')")
    val ckScala = graft.operators.ModelEval
      .cohenKappa(spark.table("ck_rated"), "lang", "pred")
    assert(ckSql.columns.toSeq == ckScala.columns.toSeq)
    assert(ckSql.exceptAll(ckScala).isEmpty && ckScala.exceptAll(ckSql).isEmpty)

    docs.select(col("doc_id"), col("lang"), col("source")).createOrReplaceTempView("ld_docs")
    val ldSql = spark.sql("SELECT * FROM ldiverse_suppress('ld_docs', 'lang', 'source', 3, 2)")
    val ldScala = graft.operators.KAnonymity
      .suppressDiverse(spark.table("ld_docs"), Seq("lang"), "source", 3, 2)
    assert(ldSql.columns.toSeq == ldScala.columns.toSeq)
    assert(ldSql.exceptAll(ldScala).isEmpty && ldScala.exceptAll(ldSql).isEmpty)

    val fdSql = spark.sql("SELECT * FROM fd_profile('ld_docs', 'doc_id,lang,source')")
    val fdScala = graft.operators.Profiling
      .functionalDependencies(spark.table("ld_docs"), Seq("doc_id", "lang", "source"))
    assert(fdSql.columns.toSeq == fdScala.columns.toSeq)
    assert(fdSql.exceptAll(fdScala).isEmpty && fdScala.exceptAll(fdSql).isEmpty)

    graft.core.Tables(spark, sfSmoke, "orders").createOrReplaceTempView("ind_orders")
    graft.core.Tables(spark, sfSmoke, "customer").createOrReplaceTempView("ind_customer")
    val indSql = spark.sql(
      "SELECT * FROM ind_profile('ind_orders:o_custkey,ind_customer:c_custkey')")
    val indScala = graft.operators.Profiling.inclusionDependencies(Seq(
      ("ind_orders.o_custkey", spark.table("ind_orders"), "o_custkey"),
      ("ind_customer.c_custkey", spark.table("ind_customer"), "c_custkey")))
    assert(indSql.columns.toSeq == indScala.columns.toSeq)
    assert(indSql.exceptAll(indScala).isEmpty && indScala.exceptAll(indSql).isEmpty)

    embs.filter(col("vec_id") < 5).createOrReplaceTempView("pq_queries")
    embs.createOrReplaceTempView("pq_corpus")
    val pqSql = spark.sql(
      "SELECT * FROM pq_adc('pq_queries', 'vec_id', 'embedding', " +
        "'pq_corpus', 'vec_id', 'embedding', 64, 4, 8, 1, 5)")
    val pqCorpus = embs.select(col("vec_id").as("vid"), col("embedding").as("emb"))
    val pqBooks = graft.operators.Pq.trainCodebooks(pqCorpus, 64, 4, 8, 1)
    val pqScala = graft.operators.Pq.adcTopK(
      embs.filter(col("vec_id") < 5)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb")),
      pqBooks, graft.operators.Pq.encode(pqCorpus, pqBooks, 64, 4), 5, 64, 4)
    assert(pqSql.columns.toSeq == pqScala.columns.toSeq)
    assert(pqSql.exceptAll(pqScala).isEmpty && pqScala.exceptAll(pqSql).isEmpty)

    docs.select(col("doc_id"), col("n_chars").cast("long").as("a"),
        (col("doc_id") % 7).cast("long").as("b"))
      .createOrReplaceTempView("pf_pts")
    val pfSql = spark.sql("SELECT * FROM pareto_front('pf_pts', 'doc_id', 'a,b')")
    val pfScala = graft.operators.Skyline
      .paretoFront(spark.table("pf_pts"), "doc_id", Seq("a", "b"))
    assert(pfSql.columns.toSeq == pfScala.columns.toSeq)
    assert(pfSql.exceptAll(pfScala).isEmpty && pfScala.exceptAll(pfSql).isEmpty)

    docs.select(col("lang"), col("n_chars").cast("long").as("v"))
      .createOrReplaceTempView("pr_vals")
    val prSql = spark.sql("SELECT * FROM percentile_ranks('pr_vals', 'lang', 'v')")
    val prScala = graft.operators.Quantiles
      .percentileRanks(spark.table("pr_vals"), "lang", "v")
    assert(prSql.columns.toSeq == prScala.columns.toSeq)
    assert(prSql.exceptAll(prScala).isEmpty && prScala.exceptAll(prSql).isEmpty)

    docs.withColumn("cl", pmod(col("doc_id"), lit(11)))
      .createOrReplaceTempView("gr_docs")
    val grSql = spark.sql(
      "SELECT * FROM golden_record('gr_docs', 'cl', 'doc_id', 'text', 'n_chars', 'lang,source')")
    val grScala = graft.operators.Survivorship.goldenRecord(
      spark.table("gr_docs"), "cl", "doc_id",
      longestCols = Seq("text"), maxCols = Seq("n_chars"), modeCols = Seq("lang", "source"))
    assert(grSql.columns.toSeq == grScala.columns.toSeq)
    assert(grSql.exceptAll(grScala).isEmpty && grScala.exceptAll(grSql).isEmpty)

    val rfmEv = graft.core.Tables(spark, sfSmoke, "events")
      .select(col("user_id"), expr("unix_micros(ts) div 1000000").as("tsec"),
        org.apache.spark.sql.functions.round(col("value") * 100).cast("long").as("cents"))
    rfmEv.createOrReplaceTempView("rfm_ev")
    val rfmAsOf = rfmEv.agg(org.apache.spark.sql.functions.max("tsec")).head().getLong(0)
    val rfmSql = spark.sql(
      s"SELECT * FROM rfm('rfm_ev', 'user_id', 'tsec', 'cents', $rfmAsOf)")
    val rfmScala = graft.operators.Cohorts.rfm(rfmEv, "user_id", "tsec", "cents", rfmAsOf)
    assert(rfmSql.columns.toSeq == rfmScala.columns.toSeq)
    assert(rfmSql.exceptAll(rfmScala).isEmpty && rfmScala.exceptAll(rfmSql).isEmpty)
  }
}
