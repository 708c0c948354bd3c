package graft

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.operators.{Dedup, SimilarityJoin}

class DedupSpec extends SparkSpec {
  init()

  private lazy val docs = Tables(spark, sfSmoke, "documents")
  private lazy val toks = SimilarityJoin.tokenize(docs, "doc_id", "text")

  test("minhash verified pairs equal the brute-force Jaccard pairs at sf0.001") {
    // all-pairs mode (no star buckets): the pair-COMPLETE contract; the
    // default star mode trades pair completeness for linear mega-bucket
    // cost and is covered by the clustering-oracle query (q19)
    val got = Dedup
      .minhashDuplicatePairs(toks, tau = 0.8, maxQuadBucket = Int.MaxValue)
      .select("x_id", "y_id")
    val a = toks.select(col("sid").as("x_id"), col("toks").as("x_toks"))
    val b = toks.select(col("sid").as("y_id"), col("toks").as("y_toks"))
    val brute = a.crossJoin(b).filter(col("x_id") < col("y_id"))
      .withColumn("inter", size(array_intersect(col("x_toks"), col("y_toks"))))
      .filter(
        col("inter").cast("double") /
          (size(col("x_toks")) + size(col("y_toks")) - col("inter")) >= 0.8)
      .select("x_id", "y_id")
    assert(got.count() == brute.count())
    assert(got.exceptAll(brute).isEmpty && brute.exceptAll(got).isEmpty)
  }

  test("connected components: min label reaches across chains") {
    import spark.implicits._
    val nodes = (1L to 7L).toDF("id")
    // chain 1-2-3, pair 5-6, singletons 4 and 7
    val edges = Seq((2L, 3L), (1L, 2L), (5L, 6L)).toDF("a", "b")
    val got = Dedup.connectedComponents(nodes, edges)
      .orderBy("id").as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 4L), (5L, 5L), (6L, 5L), (7L, 7L)))
  }

  test("connected components converge with ids near Long.MaxValue") {
    // a Long sum of labels would overflow here (ANSI exception) — the
    // decimal convergence agg must not
    import spark.implicits._
    val big = Long.MaxValue
    val ids = Seq(big, big - 1, big - 2, big - 3, big - 4)
    val nodes = ids.toDF("id")
    val edges = Seq((big, big - 1), (big - 2, big - 3)).toDF("a", "b")
    val got = Dedup.connectedComponents(nodes, edges)
      .orderBy("id").as[(Long, Long)].collect().toSeq
    assert(got == Seq(
      (big - 4, big - 4),
      (big - 3, big - 3), (big - 2, big - 3),
      (big - 1, big - 1), (big, big - 1)))
  }

  test("exact dedup groups byte-identical texts only") {
    import spark.implicits._
    val df = Seq(
      (1L, "a b c"), (2L, "a b c"), (3L, "a  b c"), (4L, "different")
    ).toDF("doc_id", "text")
    val got = Dedup.exactDedup(df, "doc_id", "text")
      .orderBy("sid").as[(Long, Long)].collect().toSeq
    // whitespace-normalized: 1,2,3 identical; 4 alone
    assert(got == Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 4L)))
  }

  test("simhash: near-duplicates land within small hamming distance, pairs found by block join") {
    import spark.implicits._
    val base = (1 to 60).map(i => s"tok$i").mkString(" ")
    val nearDup = (1 to 58).map(i => s"tok$i").mkString(" ") + " extra1 extra2"
    val other = (100 to 160).map(i => s"zz$i").mkString(" ")
    val df = Seq((1L, base), (2L, nearDup), (3L, other)).toDF("doc_id", "text")
    val t = SimilarityJoin.tokenize(df, "doc_id", "text")
    val pairs = Dedup.simhashPairs(t, maxHamming = 8)
      .as[(Long, Long, Int)].collect().toSeq
    assert(pairs.exists(p => p._1 == 1L && p._2 == 2L), s"near-dup pair not found: $pairs")
    assert(!pairs.exists(p => p._2 == 3L || p._1 == 3L), s"unrelated doc matched: $pairs")
  }

  test("minhash band signatures: deterministic, order-insensitive, near-dups collide") {
    import spark.implicits._
    val a = Seq((1L, (1 to 40).map(i => s"w$i").mkString(" ")))
      .toDF("doc_id", "text")
    val aShuffled = Seq((1L, scala.util.Random.shuffle((1 to 40).map(i => s"w$i").toList).mkString(" ")))
      .toDF("doc_id", "text")
    def bands(df: org.apache.spark.sql.DataFrame) =
      Dedup.bandSignatures(SimilarityJoin.tokenize(df, "doc_id", "text"), 32, 3)
        .orderBy("band").select("bsig").as[Long].collect().toSeq
    // same token SET → identical signatures regardless of token order
    assert(bands(a) == bands(aShuffled))
    // J = 38/42 ≈ 0.9 near-dup shares at least one of 32 bands (miss
    // probability (1−0.9³)^32 ≈ 1e-4 — deterministic here, not flaky)
    val b = Seq((2L, ((3 to 40).map(i => s"w$i") ++ Seq("x1", "x2")).mkString(" ")))
      .toDF("doc_id", "text")
    assert(bands(a).zip(bands(b)).exists { case (x, y) => x == y })
  }

  test("simhash64 matches an independent md5-hex majority computation") {
    // the same spec the DuckDB oracle replays: per-token md5 hex string,
    // plane p takes bit p%4 of hex nibble p/4, fingerprint bit = majority
    import spark.implicits._
    graft.functions.SimHash64.register(spark)
    val toksSeq = Seq("alpha", "beta", "gamma", "delta", "", "δ-utf8")
    val got = Seq((1L, toksSeq)).toDF("sid", "toks")
      .select(graft.functions.SimHash64.simhash64(col("toks")).as("fp"))
      .as[Long].head()
    val md = java.security.MessageDigest.getInstance("MD5")
    val counts = new Array[Int](64)
    for (t <- toksSeq) {
      val hex = md.digest(t.getBytes("UTF-8")).take(8)
        .flatMap(b => f"$b%02x".toCharArray)
      for (p <- 0 until 64) {
        val v = Integer.parseInt(hex(p / 4).toString, 16)
        counts(p) += (((v >> (p % 4)) & 1) << 1) - 1
      }
    }
    var exp = 0L
    for (p <- 0 until 64) if (counts(p) > 0) exp |= 1L << p
    assert(got == exp)
  }

  test("ngram tokens build consecutive shingles") {
    import spark.implicits._
    val df = Seq((1L, "a b c d")).toDF("doc_id", "text")
    val got = Dedup.ngramTokens(df, "doc_id", "text", 2)
      .select("toks").as[Seq[String]].head()
    assert(got == Seq("a_b", "b_c", "c_d"))
  }

  test("minhash dedup plan has no cartesian product") {
    val plan = Dedup.minhashDuplicatePairs(toks, 0.8).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("keep-best survivors: highest score wins its cluster, ties to smaller id") {
    import spark.implicits._
    // docs 1,2,3 are one near-dup cluster (identical token sets); 4 alone
    val df = Seq(
      (1L, "w1 w2 w3 w4 w5", 10L),
      (2L, "w5 w4 w3 w2 w1", 50L), // longest — must be the survivor
      (3L, "w1 w2 w3 w4 w5", 50L), // same score: loses the tie to id 2
      (4L, "z1 z2 z3 z4 z5", 1L)
    ).toDF("doc_id", "text", "score")
    val tokens = graft.operators.SimilarityJoin.tokenize(df, "doc_id", "text")
    val scores = df.select(col("doc_id").as("sid"), col("score"))
    val out = Dedup.minhashDedupKeepBest(tokens, scores, tau = 0.8)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out(1L) == ((1L, 0L)))
    assert(out(2L) == ((1L, 1L))) // survivor despite not being the min id
    assert(out(3L) == ((1L, 0L)))
    assert(out(4L) == ((4L, 1L))) // singleton keeps itself
  }

  test("keep-best: exactly one survivor per cluster on the corpus") {
    val docs = graft.core.Tables(spark, sfSmoke, "documents")
    val tokens = graft.operators.SimilarityJoin.tokenize(docs, "doc_id", "text")
    val scores = docs.select(col("doc_id").as("sid"), col("n_chars").as("score"))
    val out = Dedup.minhashDedupKeepBest(tokens, scores, 0.8)
    val perCluster = out.groupBy("rep")
      .agg(org.apache.spark.sql.functions.sum("keep").as("k"))
    assert(perCluster.filter(col("k") =!= 1).isEmpty)
    assert(out.count() == docs.count())
  }

  // ---------------------------------------------------- recall certificate

  /** Per-band brute-force recall ground truth for a given found-pair set. */
  private def bruteBands(found: org.apache.spark.sql.DataFrame, bandBp: Int) = {
    val a = toks.select(col("sid").as("x_id"), col("toks").as("x_toks"))
    val b = toks.select(col("sid").as("y_id"), col("toks").as("y_toks"))
    a.crossJoin(b).filter(col("x_id") < col("y_id"))
      .withColumn("inter", size(array_intersect(col("x_toks"), col("y_toks"))))
      .withColumn("uni", size(col("x_toks")) + size(col("y_toks")) - col("inter"))
      .filter(col("inter").cast("double") / col("uni") >= 0.8)
      .withColumn("jacc_bp", expr("(10000 * inter) div uni"))
      .withColumn("jacc_band_bp", col("jacc_bp") - pmod(col("jacc_bp"), lit(bandBp)))
      .join(found.select(col("x_id"), col("y_id"), lit(1L).as("hit")),
        Seq("x_id", "y_id"), "left")
      .groupBy("jacc_band_bp")
      .agg(
        count(lit(1)).as("n_true"),
        org.apache.spark.sql.functions.sum(coalesce(col("hit"), lit(0L))).as("n_found"))
  }

  test("recall certificate: full-strength config certifies 10000 bp per band") {
    val cert = Dedup.lshRecallCertificate(
      toks, 0.8, bands = 32, rowsPerBand = 3, bandBp = 250,
      maxQuadBucket = Int.MaxValue)
    val rows = cert.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Long]("recall_bp") == 10000L),
      s"full-strength LSH missed pairs: ${rows.mkString(", ")}")
    // the band census itself equals the brute-force census
    val expect = bruteBands(
      Dedup.minhashDuplicatePairs(toks, 0.8, 32, 3, Int.MaxValue), 250)
    assert(cert.select("jacc_band_bp", "n_true", "n_found")
      .exceptAll(expect.select("jacc_band_bp", "n_true", "n_found")).isEmpty)
  }

  test("recall certificate: degraded config reports the measured misses per band") {
    // one band of 8 minhash rows: P(surface | J) = J^8 — at J ≈ 0.8 only
    // ~17% of true pairs surface, so the certificate MUST report sub-10000
    // recall, and its per-band numbers must equal the brute-force replay
    val cert = Dedup.lshRecallCertificate(
      toks, 0.8, bands = 1, rowsPerBand = 8, bandBp = 250,
      maxQuadBucket = Int.MaxValue)
    val expect = bruteBands(
      Dedup.minhashDuplicatePairs(toks, 0.8, 1, 8, Int.MaxValue), 250)
    assert(cert.select("jacc_band_bp", "n_true", "n_found")
      .exceptAll(expect.select("jacc_band_bp", "n_true", "n_found")).isEmpty)
    val total = cert.agg(
      org.apache.spark.sql.functions.sum("n_true"),
      org.apache.spark.sql.functions.sum("n_found")).head()
    assert(total.getLong(1) < total.getLong(0),
      s"degraded config unexpectedly surfaced all ${total.getLong(0)} pairs")
  }
}
