package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`): brute-force cosine top-k as the exact baseline, and a
  * random-hyperplane LSH-bucketed variant as the scale path — the
  * LLM-pipeline similarity-search family.
  *
  * Everything is built from codegen'd array expressions (`zip_with` /
  * `aggregate`), no UDFs. The brute-force path broadcasts the (small) query
  * set against the corpus — corpus-parallel, no corpus×corpus pairing. The
  * LSH path reduces each query to `tables` bucket lookups: candidates come
  * from an equi-join on (table, bucket), so the corpus is never scanned per
  * query — at 100 TB the bucket join is the only shuffle and AQE handles
  * hot buckets.
  */
object SimilaritySearch {

  /** Sequential-fold dot product in double precision (deterministic
    * left-to-right order — important for cross-engine comparisons).
    */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, x) => acc + x)

  def l2norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0), (acc, x) => acc + x.cast("double") * x.cast("double")))

  /** Composed higher-order-function cosine — the SQL-shaped reference form
    * every oracle replays. Kept as the equivalence baseline for
    * [[graft.functions.CosineSimilarity]]; NOT used on hot paths:
    * `aggregate`/`zip_with` are CodegenFallback and this tree is three
    * passes over the arrays (re-evaluated per referencing column).
    */
  def cosineComposed(a: Column, b: Column): Column =
    dot(a, b) / (l2norm(a) * l2norm(b))

  /** Fused single-pass native cosine (bit-identical to [[cosineComposed]],
    * property-spec'd). Callers must have [[graft.functions.CosineSimilarity]]
    * registered on the session — every operator entry point in this file
    * and in [[graft.streaming.StreamingSemanticDedup]] does so.
    */
  def cosine(a: Column, b: Column): Column =
    graft.functions.CosineSimilarity.cosine_sim(a, b)

  /** Exact cosine top-k: for each query vector, the `k` nearest corpus
    * vectors (excluding identical ids). Queries are broadcast (the query
    * set must be small — that is the baseline's contract); the per-query
    * top-k runs through the two-phase [[TopK]] so no single query funnels
    * the corpus into one task.
    * Output: (q_id, n_id, rank, sim).
    */
  def bruteForceTopK(
      queries: DataFrame, // (q_id, q_emb)
      corpus: DataFrame, // (n_id, n_emb)
      k: Int): DataFrame = {
    graft.functions.CosineSimilarity.register(corpus.sparkSession)
    val scored = corpus
      .crossJoin(broadcast(queries))
      .filter(col("q_id") =!= col("n_id"))
      .withColumn("sim", cosine(col("q_emb"), col("n_emb")))
    TopK
      .perGroup(scored, Seq("q_id"), Seq(col("sim").desc, col("n_id")), k, rankCol = "rank")
      .select("q_id", "n_id", "rank", "sim")
  }

  /** HARD-NEGATIVE mining for embedding-model training: for each query
    * (anchor) vector, the `k` MOST similar corpus vectors whose cosine is
    * still BELOW `tauDup` — the contrastive-training sampler (the hardest
    * negatives teach the most, but anything at/above `tauDup` is a likely
    * duplicate/positive and would poison the negative set with false
    * negatives). Same scale contract as [[bruteForceTopK]]: the anchor
    * set broadcasts, the corpus streams, per-anchor top-k through the
    * two-phase [[TopK]]; for corpus-sized anchor sets run the IVF path
    * first and apply the same `sim < tauDup` gate to its candidates.
    * Output: (q_id, n_id, rank, sim).
    */
  def hardNegatives(
      queries: DataFrame, // (q_id, q_emb)
      corpus: DataFrame, // (n_id, n_emb)
      k: Int,
      tauDup: Double): DataFrame = {
    graft.functions.CosineSimilarity.register(corpus.sparkSession)
    val scored = corpus
      .crossJoin(broadcast(queries))
      .filter(col("q_id") =!= col("n_id"))
      .withColumn("sim", cosine(col("q_emb"), col("n_emb")))
      .filter(col("sim") < tauDup)
    TopK
      .perGroup(scored, Seq("q_id"), Seq(col("sim").desc, col("n_id")), k, rankCol = "rank")
      .select("q_id", "n_id", "rank", "sim")
  }

  /** (id, table, bucket) rows: one per vector per table. All bucket ids
    * come from ONE pass of the native [[graft.functions.LshSignature]]
    * expression (precomputed deterministic Rademacher sign matrix, fused
    * loop in whole-stage codegen) — the declarative per-plane
    * `aggregate`/`zip_with` form re-derived the hyperplanes per row per
    * element and dominated the ANN queries' runtime.
    */
  def bucketize(df: DataFrame, idCol: String, embCol: String, tables: Int, bits: Int, dim: Int): DataFrame = {
    graft.functions.LshSignature.register(df.sparkSession)
    df.select(
        col(idCol),
        posexplode(graft.functions.LshSignature.lsh_signature(col(embCol), tables, bits))
          .as(Seq("tbl", "bucket")))
  }

  /** LSH-bucketed approximate top-k: candidates are corpus vectors sharing
    * any (table, bucket) with the query; exact cosine re-ranks them.
    * Recall is governed by (tables, bits) — more tables/fewer bits = higher
    * recall, more candidates. Output: (q_id, n_id, rank, sim).
    */
  def lshTopK(
      queries: DataFrame, // (q_id, q_emb)
      corpus: DataFrame, // (n_id, n_emb)
      k: Int,
      tables: Int = 16,
      bits: Int = 8,
      dim: Int = 64): DataFrame = {
    graft.functions.CosineSimilarity.register(corpus.sparkSession)
    val qB = bucketize(queries, "q_id", "q_emb", tables, bits, dim)
    val cB = bucketize(corpus, "n_id", "n_emb", tables, bits, dim)
    val cand = qB.join(cB, Seq("tbl", "bucket"))
      .filter(col("q_id") =!= col("n_id"))
      .select("q_id", "n_id")
      .dropDuplicates("q_id", "n_id")
    val scored = cand
      .join(queries, "q_id")
      .join(corpus, "n_id")
      .withColumn("sim", cosine(col("q_emb"), col("n_emb")))
    TopK
      .perGroup(scored, Seq("q_id"), Seq(col("sim").desc, col("n_id")), k, rankCol = "rank")
      .select("q_id", "n_id", "rank", "sim")
  }

  /** IVF (inverted-file) approximate top-k — the second ANN scale path
    * alongside LSH: the corpus is coarse-quantized into `nCells` cells
    * (centroids = a deterministic hash-ordered sample of corpus vectors,
    * the k-means-free IVF seeding), each vector assigned to its
    * best-cosine cell; a query probes only its `nProbe` nearest cells.
    *
    * Scale shape: centroids are a tiny broadcast relation; assignment is
    * one corpus-linear pass (corpus × nCells broadcast products, max_by
    * aggregation); the probe is a cell equi-join — the corpus is never
    * scanned per query and the only shuffles are the assignment groupBy
    * and the candidate join. Recall is governed by (nCells, nProbe).
    * Output: (q_id, n_id, rank, sim).
    */
  def ivfTopK(
      queries: DataFrame, // (q_id, q_emb)
      corpus: DataFrame, // (n_id, n_emb)
      k: Int,
      nCells: Int = 64,
      nProbe: Int = 8): DataFrame = {
    val (centroids, assigned) = buildIvfIndex(corpus, nCells)
    ivfTopKFromIndex(queries, centroids, assigned, k, nProbe)
  }

  /** The index half of [[ivfTopK]] as two PERSISTABLE relations:
    * centroids (cell, c_emb) and assignments (n_id, n_emb, cell). Write
    * the assignments `partitionBy("cell")` and a later probe with
    * `pruneCells = true` reads only the probed cells' files — the
    * build-once/probe-many ANN serving shape (the embedding-scale
    * analogue of the q35 signature-index persist).
    */
  def buildIvfIndex(corpus: DataFrame, nCells: Int = 64): (DataFrame, DataFrame) = {
    graft.functions.CosineSimilarity.register(corpus.sparkSession)
    // deterministic centroid sample, spread by id hash. The hash is MD5 of
    // the decimal id string — bit-identical in any engine (unlike a seeded
    // xxhash64), which is what makes the whole IVF result SQL-oracle-able.
    // The cell-id window runs over nCells rows post-limit (bounded at any
    // scale — the "no partition defined" warning is about THIS tiny sort).
    val idHash = md5(col("c_src").cast("string"))
    val centroids = corpus
      .select(col("n_id").as("c_src"), col("n_emb").as("c_emb"))
      .orderBy(md5(col("c_src").cast("string")), col("c_src"))
      .limit(nCells)
      .withColumn(
        "cell",
        row_number().over(
          org.apache.spark.sql.expressions.Window.orderBy(idHash, col("c_src"))))
      .select("cell", "c_emb")

    // corpus-linear assignment: best-cosine cell per vector
    val assigned = corpus
      .crossJoin(broadcast(centroids))
      .groupBy("n_id")
      .agg(
        first(col("n_emb")).as("n_emb"),
        // tie-break on the smaller cell id so assignment is deterministic
        max_by(col("cell"), struct(cosine(col("n_emb"), col("c_emb")), -col("cell"))).as("cell"))
    (centroids, assigned)
  }

  /** Incremental IVF index MAINTENANCE: assign a batch of new vectors to
    * an existing index's FROZEN centroids — continuous ingest without a
    * rebuild. The centroid set is fixed at initial build by contract
    * (re-centering changes every assignment and is a rebuild decision,
    * not an upsert); additions probe the broadcast centroids in one
    * input-linear pass, so the returned rows touch only the additions'
    * cells. Against `partitionBy("cell")` parquet, write them with
    * dynamic partition overwrite (read-merge-write of ONLY those cells —
    * IvfIndexSpec pins that untouched cell directories keep their files
    * byte-identical) and every later [[ivfTopKFromIndex]] probe sees the
    * merged index. At 100 TB a crawl increment is a few cells' rewrite,
    * never an index scan.
    * Input/output rows: (n_id, n_emb[, cell]) — same relation shape as
    * [[buildIvfIndex]]'s assignments.
    */
  def upsertIvfIndex(centroids: DataFrame, additions: DataFrame): DataFrame =
    assignToCentroids(
      additions.select(col("n_id").as("vid"), col("n_emb").as("emb")),
      centroids)
      .select(col("vid").as("n_id"), col("emb").as("n_emb"), col("cell"))

  /** The probe half of [[ivfTopK]] against a (possibly persisted) index.
    * With `pruneCells = true` the distinct probed cells are collected
    * (bounded by nCells — never data-sized) and pushed as an `isin`
    * filter on the assignment read, which prunes `partitionBy("cell")`
    * parquet down to the probed cells' directories.
    */
  def ivfTopKFromIndex(
      queries: DataFrame, // (q_id, q_emb)
      centroids: DataFrame, // (cell, c_emb)
      assigned: DataFrame, // (n_id, n_emb, cell)
      k: Int,
      nProbe: Int = 8,
      pruneCells: Boolean = false): DataFrame = {
    graft.functions.CosineSimilarity.register(queries.sparkSession)
    // query probes its nProbe nearest cells
    val probed = TopK.perGroup(
        queries.crossJoin(broadcast(centroids))
          .withColumn("csim", cosine(col("q_emb"), col("c_emb"))),
        Seq("q_id"), Seq(col("csim").desc, col("cell")), nProbe, rankCol = "crank")
      .select("q_id", "q_emb", "cell")

    val candidateCells =
      if (!pruneCells) assigned
      else {
        val cells = probed.select("cell").distinct().collect().map(_.get(0))
        assigned.filter(col("cell").isin(cells.toSeq: _*))
      }
    val scored = probed
      .join(candidateCells, "cell")
      .filter(col("q_id") =!= col("n_id"))
      .withColumn("sim", cosine(col("q_emb"), col("n_emb")))
    TopK
      .perGroup(scored, Seq("q_id"), Seq(col("sim").desc, col("n_id")), k, rankCol = "rank")
      .select("q_id", "n_id", "rank", "sim")
  }

  /** The deterministic centroid sample of the SemDeDup family: `nCells`
    * vectors spread by MD5 of the decimal id (bit-identical in any engine
    * — what keeps the whole cell pipeline SQL-oracle-able).
    * Output: (cell, c_emb), cell ∈ [1, nCells].
    */
  private[graft] def centroidsOf(vectors: DataFrame, nCells: Int): DataFrame = {
    val idHash = md5(col("c_src").cast("string"))
    vectors
      .select(col("vid").as("c_src"), col("emb").as("c_emb"))
      .orderBy(md5(col("c_src").cast("string")), col("c_src"))
      .limit(nCells)
      .withColumn(
        "cell",
        row_number().over(
          org.apache.spark.sql.expressions.Window.orderBy(idHash, col("c_src"))))
      .select("cell", "c_emb")
  }

  /** Best-cosine cell per vector against an EXPLICIT centroid relation
    * (smaller cell on ties) — the assignment half of [[assignCells]],
    * factored out so a second relation (e.g. an eval set in
    * [[Decontamination.flagSemanticCells]]) can be assigned to the SAME
    * cells as the corpus that defined them. Centroids broadcast;
    * assignment is input-linear. Output: (vid, emb, cell).
    */
  private[graft] def assignToCentroids(vectors: DataFrame, centroids: DataFrame): DataFrame = {
    graft.functions.CosineSimilarity.register(vectors.sparkSession)
    vectors
      .crossJoin(broadcast(centroids))
      .groupBy("vid")
      .agg(
        first(col("emb")).as("emb"),
        max_by(col("cell"), struct(cosine(col("emb"), col("c_emb")), -col("cell"))).as("cell"))
  }

  /** Deterministic IVF cell assignment shared by the SemDeDup family:
    * MD5-ordered centroid sample, best-cosine cell, smaller cell on ties.
    * Output: (vid, emb, cell).
    */
  private[graft] def assignCells(vectors: DataFrame, nCells: Int): DataFrame =
    assignToCentroids(vectors, centroidsOf(vectors, nCells))

  /** Same-cell near-duplicate pairs at cosine ≥ τ — the SemDeDup edge set
    * as ordered pairs (y_id < x_id), for composition with other dedup
    * tiers (see [[Dedup.hybridDedup]]). Candidate volume is Σ|cell|².
    */
  def cellPairs(vectors: DataFrame, tau: Double, nCells: Int = 64): DataFrame = {
    val assigned = assignCells(vectors, nCells)
    val x = assigned.select(col("vid").as("x_id"), col("emb").as("x_emb"), col("cell"))
    val y = assigned.select(col("vid").as("y_id"), col("emb").as("y_emb"), col("cell"))
    x.join(y, Seq("cell"))
      .filter(col("y_id") < col("x_id"))
      .filter(cosine(col("x_emb"), col("y_emb")) >= tau)
      .select(col("x_id"), col("y_id"))
  }

  /** SEMANTIC deduplication over embeddings (SemDeDup, Abbas et al. 2023,
    * arXiv:2303.09540): coarse-quantize the corpus into IVF cells, then
    * drop near-duplicates WITHIN each cell — the curation step that
    * removes semantically redundant documents exact/token dedup can't see.
    * Decision per vector: `dup_of` = min same-cell id with cosine ≥ τ and
    * smaller id (−1 = kept) — the keep-one-representative contract, same
    * shape as the token-level dedup family.
    *
    * Cells reuse [[ivfTopK]]'s deterministic seeding (MD5-ordered corpus
    * sample → engine-portable, exactly SQL-oracle-able) and assignment
    * (best-cosine, smaller cell on ties). Pairs that straddle a cell
    * boundary are not compared — inherent to SemDeDup (recall is governed
    * by nCells), which is what keeps the candidate volume Σ|cell|² ≪
    * corpus² and lets the whole pass run as one broadcast assignment + one
    * cell equi-join. At corpus scale nCells grows with the data (the
    * paper's k ∝ n rule) so cell populations stay bounded.
    * Output: (vid, dup_of).
    */
  def semanticDedup(
      vectors: DataFrame, // (vid, emb)
      tau: Double,
      nCells: Int = 64): DataFrame = {
    val assigned = assignCells(vectors, nCells)

    val x = assigned.select(col("vid").as("x_id"), col("emb").as("x_emb"), col("cell"))
    val y = assigned.select(col("vid").as("y_id"), col("emb").as("y_emb"), col("cell"))
    val dupOf = x.join(y, Seq("cell"))
      .filter(col("y_id") < col("x_id"))
      .filter(cosine(col("x_emb"), col("y_emb")) >= tau)
      .groupBy("x_id")
      .agg(min("y_id").as("dup_of"))

    assigned.select(col("vid"))
      .join(dupOf, col("vid") === col("x_id"), "left")
      .select(col("vid"), coalesce(col("dup_of"), lit(-1L)).as("dup_of"))
  }

  /** Embedding-cosine near-duplicate pairs (dedup family): all pairs with
    * cosine ≥ τ, candidates from shared LSH buckets (never all-pairs).
    * Output: (x_id, y_id, sim) with x_id < y_id.
    */
  def nearDupPairs(
      vectors: DataFrame, // (vid, emb)
      tau: Double,
      tables: Int = 16,
      bits: Int = 8,
      dim: Int = 64): DataFrame = {
    graft.functions.CosineSimilarity.register(vectors.sparkSession)
    val b = bucketize(vectors, "vid", "emb", tables, bits, dim)
    val cand = b.select(col("vid").as("x_id"), col("tbl"), col("bucket"))
      .join(b.select(col("vid").as("y_id"), col("tbl"), col("bucket")), Seq("tbl", "bucket"))
      .filter(col("x_id") < col("y_id"))
      .select("x_id", "y_id")
      .dropDuplicates("x_id", "y_id")
    cand
      .join(vectors.select(col("vid").as("x_id"), col("emb").as("x_emb")), "x_id")
      .join(vectors.select(col("vid").as("y_id"), col("emb").as("y_emb")), "y_id")
      .withColumn("sim", cosine(col("x_emb"), col("y_emb")))
      .filter(col("sim") >= tau)
      .select("x_id", "y_id", "sim")
  }

  /** Chunk→document embedding pooling on the exact integer grid: the mean
    * of each group's chunk embeddings (RAG/doc-retrieval pipelines embed
    * CHUNKS, then serve one vector per document), with every component
    * first snapped to a 2^scaleBits fixed-point grid (the
    * [[quantizeInt8]] floor(x+½) recipe — IEEE-exact, engine-portable)
    * and then averaged as INTEGER sum ÷ count. Float summation is not
    * associative, so a float mean would depend on aggregation order —
    * this form is bit-identical under any shuffle order, retry, or
    * engine, which is what lets a pooled-embedding relation be content-
    * addressed and exactly oracled.
    *
    * Scale shape: explode to (group, dim) grain, ONE map-side-combining
    * aggregation — dims are fixed, so exchange volume is groups × dim.
    * Output: (gid, dim, n_chunks, pooled_q) with
    * pooled_q = ⌊Σ round(x·2^scaleBits)⌋ div n — consumers needing floats
    * divide by 2^scaleBits (a lossless power-of-two scale).
    */
  def meanPoolQuantized(
      grouped: DataFrame, // (gid, emb)
      scaleBits: Int = 20): DataFrame = {
    require(scaleBits > 0 && scaleBits < 40, s"scaleBits out of range: $scaleBits")
    val grid = (1L << scaleBits).toDouble
    grouped
      .select(col("gid"), posexplode(col("emb")).as(Seq("dim", "v")))
      .withColumn("q", floor(col("v").cast("double") * grid + lit(0.5)).cast("long"))
      .groupBy("gid", "dim")
      .agg(count(lit(1)).as("n_chunks"), sum("q").as("s"))
      .select(
        col("gid"),
        col("dim").cast("long").as("dim"),
        col("n_chunks"),
        expr("s div n_chunks").as("pooled_q"))
  }

  /** Symmetric int8 quantization of an embedding corpus — the 4×
    * footprint cut before a vector index is built or served. Per vector:
    * scale = max|x_i| (an exact float→double, so the oracle replays it
    * bit-for-bit), code_i = ⌊x_i/scale·127 + ½⌋ ∈ [−127, 127] (every
    * step an IEEE-correctly-rounded double op in a FIXED order — any
    * engine computes the identical code), all-zero vectors code to 0.
    * A pure scan-level projection: no shuffle, no state.
    * Output: (id, scale, codes array<int>).
    */
  def quantizeInt8(df: DataFrame, idCol: String, embCol: String): DataFrame =
    df.select(col(idCol), col(embCol).as("e"))
      .withColumn("scale", coalesce(
        array_max(transform(col("e"), x => abs(x.cast("double")))), lit(0.0)))
      .withColumn(
        "codes",
        when(col("scale") === 0.0, transform(col("e"), _ => lit(0)))
          .otherwise(transform(col("e"),
            x => floor(x.cast("double") / col("scale") * lit(127.0) + lit(0.5)).cast("int"))))
      .select(col(idCol), col("scale"), col("codes"))

  /** Cosine over int8 code vectors in EXACT integer numerators: dot and
    * both norms are long sums (≤ dim·127² — exact in a double), the only
    * IEEE ops are one sqrt and one division of exactly-representable
    * integers, so scores are bit-identical cross-engine (cosine is
    * scale-invariant, so the per-vector scales cancel and never enter).
    * Zero-norm codes score 0 against everything.
    */
  def codeCosine(a: Column, b: Column): Column = {
    def dot(x: Column, y: Column) =
      aggregate(
        zip_with(x, y, (p, q) => p.cast("long") * q.cast("long")),
        lit(0L), (acc, v) => acc + v)
    val d = dot(a, b)
    val na = dot(a, a)
    val nb = dot(b, b)
    when(na === 0L || nb === 0L, lit(0.0))
      .otherwise(d.cast("double") / sqrt((na * nb).cast("double")))
  }

  /** Exact top-k over the QUANTIZED corpus ([[quantizeInt8]] codes) —
    * the serving-shape ANN baseline whose recall against the float
    * ranking certifies a quantization setting. Same scale shape as
    * [[bruteForceTopK]]: queries broadcast, two-phase per-query top-k.
    * Output: (q_id, n_id, rank, qsim — rounded 4dp for display; ranking
    * uses the raw bit-exact score with an id tiebreak).
    */
  def quantizedTopK(
      queries: DataFrame, // (q_id, q_codes)
      corpus: DataFrame, // (n_id, n_codes)
      k: Int): DataFrame = {
    val scored = corpus
      .crossJoin(broadcast(queries))
      .filter(col("q_id") =!= col("n_id"))
      .withColumn("qc", codeCosine(col("q_codes"), col("n_codes")))
    TopK
      .perGroup(scored, Seq("q_id"), Seq(col("qc").desc, col("n_id")), k, rankCol = "rank")
      .select(col("q_id"), col("n_id"), col("rank"), round(col("qc"), 4).as("qsim"))
  }

  // ------------------------------------------- random projection (JL)

  /** Rademacher sign s(i,j) ∈ {−1,+1} from the parity of the first hex
    * digit of md5("i:j") — the same engine-portable digest-derivation
    * trick as SimHash/pHash, so a SQL oracle replays the whole sign
    * matrix bit-for-bit (`md5(i || ':' || j)`).
    */
  private[graft] def jlSign(i: Int, j: Int): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$i:$j".getBytes("UTF-8"))
    if (((d(0) >> 4) & 0xf) % 2 == 1) 1L else -1L
  }

  /** Johnson–Lindenstrauss SIGN projection: dim → `outDims` with a
    * deterministic Rademacher (±1) matrix (Achlioptas 2001 — database-
    * friendly random projections) — the footprint cut BEFORE clustering
    * or indexing a 100-TB embedding corpus (complementary to
    * [[quantizeInt8]], which narrows the cell type; this narrows the
    * DIMENSION, so an IVF build's assignment FLOPs and the index bytes
    * both drop by dim/outDims).
    *
    * Exactness: inputs land on the 2^`scaleBits` fixed-point grid
    * (q_i = ⌊x_i·2^s + ½⌋, the [[meanPoolQuantized]] recipe), each output
    * coordinate is an INTEGER sum Σ_i q_i·s(i,j) — |proj_j| ≤
    * dim·2^(s+1), exact in a long at any sane (dim, s) — and the sign
    * matrix is md5-derived, so every projected vector is bit-identical
    * in any engine. The matrix is baked into the plan as literals
    * (dim × outDims multiply-adds per row inside whole-stage codegen;
    * no per-row digest calls).
    *
    * A pure scan-level map: no shuffle, no state. Output: (idCol, proj
    * array<long> of length outDims).
    */
  def signProject(
      df: DataFrame,
      idCol: String,
      embCol: String,
      dim: Int,
      outDims: Int,
      scaleBits: Int = 14): DataFrame = {
    require(dim > 0 && outDims > 0, s"signProject: bad dims ($dim → $outDims)")
    require(scaleBits > 0 && scaleBits < 30, s"signProject: scaleBits out of range: $scaleBits")
    val grid = (1L << scaleBits).toDouble
    val q = transform(
      col(embCol),
      x => floor(x.cast("double") * grid + lit(0.5)).cast("long"))
    // stage the quantized array once (the q58 staged-projection lesson),
    // then one literal-sign fold per output coordinate
    df.select(col(idCol), q.as("__q"))
      .select(
        col(idCol),
        array((0 until outDims).map { j =>
          val signs = array((0 until dim).map(i => lit(jlSign(i, j))): _*)
          aggregate(
            zip_with(col("__q"), signs, (a, s) => a * s),
            lit(0L), (acc, v) => acc + v)
        }: _*).as("proj"))
  }

  /** Cosine over PROJECTED long vectors. Unlike [[codeCosine]] the norm
    * product can exceed a long (norms reach ~dim·(dim·2^s)²), so each
    * factor converts to double BEFORE the product: d / (√na · √nb) —
    * every step an IEEE-defined op on integer-valued inputs, identical
    * in any engine that mirrors the parenthesization.
    */
  def projCosine(a: Column, b: Column): Column = {
    def dotL(x: Column, y: Column) =
      aggregate(zip_with(x, y, (p, q) => p * q), lit(0L), (acc, v) => acc + v)
    val d = dotL(a, b)
    val na = dotL(a, a)
    val nb = dotL(b, b)
    when(na === 0L || nb === 0L, lit(0.0))
      .otherwise(d.cast("double") / (sqrt(na.cast("double")) * sqrt(nb.cast("double"))))
  }

  /** RECALL CERTIFICATE for a sign-projection setting: exact float-cosine
    * top-k per query vs top-k in the `outDims`-dimensional projected
    * space, reported as hits and basis-point recall — the measurement
    * that certifies (or rejects) a dim cut before it's applied
    * corpus-wide, exactly as [[Dedup.lshRecallCertificate]] certifies an
    * LSH banding. Both rankings tiebreak on the neighbor id, so the sets
    * are deterministic. Queries broadcast; the corpus is scanned twice
    * (once per representation), never paired with itself.
    * Output: (q_id, k, n_hit, recall_bp).
    */
  def jlRecall(
      queries: DataFrame, // (q_id, q_emb)
      corpus: DataFrame, // (n_id, n_emb)
      dim: Int,
      outDims: Int,
      k: Int,
      scaleBits: Int = 14): DataFrame = {
    val exact = bruteForceTopK(queries, corpus, k).select("q_id", "n_id")
    val pq = signProject(queries, "q_id", "q_emb", dim, outDims, scaleBits)
      .select(col("q_id"), col("proj").as("q_proj"))
    val pc = signProject(corpus, "n_id", "n_emb", dim, outDims, scaleBits)
      .select(col("n_id"), col("proj").as("n_proj"))
    val scored = pc
      .crossJoin(broadcast(pq))
      .filter(col("q_id") =!= col("n_id"))
      .withColumn("psim", projCosine(col("q_proj"), col("n_proj")))
    val approx = TopK
      .perGroup(scored, Seq("q_id"), Seq(col("psim").desc, col("n_id")), k, rankCol = "rank")
      .select("q_id", "n_id")
    exact
      .join(approx.withColumn("__hit", lit(1)), Seq("q_id", "n_id"), "left")
      .groupBy("q_id")
      .agg(
        count(lit(1)).as("k"),
        sum(coalesce(col("__hit"), lit(0))).cast("long").as("n_hit"))
      .select(
        col("q_id"), col("k"),
        col("n_hit"),
        expr("(10000 * n_hit) div k").as("recall_bp"))
  }
}
