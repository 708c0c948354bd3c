package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product quantization (Jégou et al. 2011) — the codebook compression
  * tier of the ANN family, beside [[SimilaritySearch.quantizeInt8]]
  * (scalar narrowing) and [[SimilaritySearch.signProject]] (dimension
  * narrowing): the vector splits into `m` subvectors, each subspace
  * learns a `ks`-centroid codebook, and a vector ships as m small codes
  * (m·log₂ks bits — 64 float dims → 4 bytes at m=4, ks=16). Asymmetric
  * distance (ADC) scores a query against codes through a per-query
  * distance TABLE of m·ks entries, so the corpus pass never touches
  * vectors — the FAISS IVF-PQ serving shape.
  *
  * Exactness contract (what makes it oracle-able): vectors land on the
  * 2^quantBits integer grid once; centroids are kept as INTEGER vectors —
  * the floor-divided mean `s div cnt` — rather than rationals, so every
  * distance anywhere in train/encode/ADC is Σ(q−c)², a bounded long with
  * NO division: assignment argmins, codes, and ADC ranks are
  * order-invariant and replay bit-for-bit in any engine. (Floor-rounding
  * a centroid perturbs it by < 1 grid cell — noise far below the
  * quantization PQ already accepts; [[Clustering.kmeansAssign]] keeps
  * the exact-rational form where clustering itself is the product.)
  *
  * Scale shape: training explodes the corpus once into m subvector rows
  * and runs all m Lloyd problems SIMULTANEOUSLY keyed by (sub, cell) —
  * per round one broadcast of m·ks integer centroids + one
  * map-side-combined (sub, cell, dim) sum; encode is one broadcast argmin
  * pass; ADC builds the m·ks distance table per query (broadcast) and
  * folds codes in one exchange. Nothing corpus-sized is ever collected,
  * joined all-pairs, or windowed globally.
  */
object Pq {

  private def quantize(emb: Column, bits: Int): Column =
    transform(emb, x => floor(x.cast("double") * (1L << bits) + 0.5).cast("long"))

  /** Integer squared distance Σ(a−b)² between long vectors. */
  private def d2i(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0L), (acc, v) => acc + v)

  /** (vid, sub, sq) — the corpus exploded into m quantized subvectors. */
  private def subvectors(
      vectors: DataFrame, dim: Int, m: Int, quantBits: Int): DataFrame = {
    val subDim = dim / m
    vectors
      .select(col("vid"), quantize(col("emb"), quantBits).as("qe"))
      .select(
        col("vid"),
        explode(array((0 until m).map(s =>
          struct(
            lit(s).as("sub"),
            slice(col("qe"), s * subDim + 1, subDim).as("sq"))): _*)).as("p"))
      .select(col("vid"), col("p.sub").as("sub"), col("p.sq").as("sq"))
  }

  /** Per-(vid, sub) nearest codebook cell, tie-broken by cell id. */
  private def assign(sv: DataFrame, books: DataFrame): DataFrame =
    sv.join(broadcast(books), "sub")
      .withColumn("d2", d2i(col("sq"), col("c")))
      .groupBy("vid", "sub")
      .agg(
        first(col("sq")).as("sq"),
        min_by(col("cell"), struct(col("d2"), col("cell"))).as("cell"))

  /** Train the m codebooks: (sub, cell, c array<long>) after `iters`
    * integer-centroid Lloyd rounds from the MD5-ordered deterministic
    * per-subspace seed (the IVF family's seeding recipe).
    */
  def trainCodebooks(
      vectors: DataFrame, // (vid, emb)
      dim: Int,
      m: Int,
      ks: Int,
      iters: Int,
      quantBits: Int = 10): DataFrame = {
    require(m > 0 && dim % m == 0, s"dim $dim must divide into m=$m subspaces")
    require(ks > 0 && iters >= 0, s"bad ks=$ks iters=$iters")
    val sv = subvectors(vectors, dim, m, quantBits)
    var books = TopK
      .perGroup(
        sv.select(col("sub"), col("vid"), col("sq")),
        Seq("sub"),
        Seq(md5(col("vid").cast("string")).asc, col("vid").asc),
        ks,
        rankCol = "cell")
      .select(col("sub"), col("cell"), col("sq").as("c"))
    for (_ <- 1 to iters) {
      books = assign(sv, books)
        .select(col("sub"), col("cell"), posexplode(col("sq")).as(Seq("dim", "v")))
        .groupBy("sub", "cell", "dim")
        .agg(sum("v").as("sv"), count(lit(1)).as("cnt"))
        .groupBy("sub", "cell")
        .agg(
          transform(
            array_sort(collect_list(struct(col("dim"), col("sv"), col("cnt")))),
            // FLOOR-divided mean: sums stay ≤ 2^53 so the double quotient
            // is exact and floor is engine-portable (DuckDB replays
            // floor(CAST(sv AS DOUBLE)/cnt) identically; integer `div`
            // vs `//` trunc/floor seams never enter)
            s => floor(
              s.getField("sv").cast("double") / s.getField("cnt").cast("double"))
              .cast("long")).as("c"))
    }
    books
  }

  /** Encode: (vid, codes array<int>) — codes ordered by subspace. */
  def encode(
      vectors: DataFrame,
      books: DataFrame,
      dim: Int,
      m: Int,
      quantBits: Int = 10): DataFrame =
    assign(subvectors(vectors, dim, m, quantBits), books)
      .groupBy("vid")
      .agg(
        transform(
          array_sort(collect_list(struct(col("sub"), col("cell")))),
          s => s.getField("cell").cast("int")).as("codes"))

  /** ADC top-k: per query, the k nearest encoded corpus vectors by
    * Σ_sub d²(q_sub, codebook(sub, code_sub)) — exact integers end to
    * end, rank tie-broken by n_id.
    * Output: (q_id, n_id, rank, d2).
    */
  def adcTopK(
      queries: DataFrame, // (q_id, q_emb)
      books: DataFrame,
      codes: DataFrame, // (vid, codes)
      k: Int,
      dim: Int,
      m: Int,
      quantBits: Int = 10): DataFrame = {
    // per-query distance table: m·ks rows per query — broadcast-sized
    val qsv = subvectors(
      queries.select(col("q_id").as("vid"), col("q_emb").as("emb")), dim, m, quantBits)
      .select(col("vid").as("q_id"), col("sub"), col("sq"))
    val dtable = qsv.join(broadcast(books), "sub")
      .select(col("q_id"), col("sub"), col("cell"), d2i(col("sq"), col("c")).as("d2"))
    val coded = codes
      .select(
        col("vid").as("n_id"),
        posexplode(col("codes")).as(Seq("sub", "cell")))
      .withColumn("cell", col("cell").cast("long"))
    val scored = coded
      .join(broadcast(dtable), Seq("sub", "cell"))
      .filter(col("q_id") =!= col("n_id"))
      .groupBy("q_id", "n_id")
      .agg(sum("d2").as("d2"))
    TopK
      .perGroup(scored, Seq("q_id"), Seq(col("d2").asc, col("n_id").asc), k, rankCol = "rank")
      .select(col("q_id"), col("n_id"), col("rank").cast("long").as("rank"), col("d2"))
  }

  /** IVF-PQ: the composed serving index — coarse IVF cells prune the
    * candidate set ([[SimilaritySearch.buildIvfIndex]]'s cosine cells,
    * query probes its `nProbe` nearest), and ADC scores ONLY the probed
    * cells' codes. Candidate volume per query is Σ|probed cells| and the
    * scored payload is codes, never vectors — at 100 TB the index is
    * cells × (4-byte codes + 8-byte ids) and a query touches
    * nProbe/nCells of it. Output: (q_id, n_id, rank, d2).
    */
  def ivfPqTopK(
      queries: DataFrame, // (q_id, q_emb)
      centroids: DataFrame, // (cell, c_emb) — coarse IVF cells
      assigned: DataFrame, // (n_id, cell) — coarse assignment
      books: DataFrame,
      codes: DataFrame, // (vid, codes)
      k: Int,
      dim: Int,
      m: Int,
      nProbe: Int = 4,
      quantBits: Int = 10): DataFrame = {
    graft.functions.CosineSimilarity.register(queries.sparkSession)
    // probe cells per query: nProbe best-cosine coarse cells (bounded:
    // queries × nCells rows, the q44 probe shape)
    val probes = TopK
      .perGroup(
        queries.crossJoin(broadcast(centroids))
          .withColumn(
            "csim",
            graft.functions.CosineSimilarity.cosine_sim(col("q_emb"), col("c_emb"))),
        Seq("q_id"),
        Seq(col("csim").desc, col("cell").asc),
        nProbe,
        rankCol = "pr")
      .select(col("q_id").as("__p_qid"), col("cell"))
    val qsv = subvectors(
      queries.select(col("q_id").as("vid"), col("q_emb").as("emb")), dim, m, quantBits)
      .select(col("vid").as("q_id"), col("sub"), col("sq"))
    val dtable = qsv.join(broadcast(books), "sub")
      .select(col("q_id"), col("sub"), col("cell"), d2i(col("sq"), col("c")).as("d2"))
    // candidates: codes of vectors in the query's probed coarse cells
    val cand = assigned
      .join(broadcast(probes), Seq("cell"))
      .select(col("__p_qid"), col("n_id"))
    val scored = cand
      .join(codes.select(col("vid").as("n_id"), col("codes")), "n_id")
      .select(
        col("__p_qid").as("q_id"),
        col("n_id"),
        posexplode(col("codes")).as(Seq("sub", "cell")))
      .join(broadcast(dtable), Seq("q_id", "sub", "cell"))
      .filter(col("q_id") =!= col("n_id"))
      .groupBy("q_id", "n_id")
      .agg(sum("d2").as("d2"))
    TopK
      .perGroup(scored, Seq("q_id"), Seq(col("d2").asc, col("n_id").asc), k, rankCol = "rank")
      .select(col("q_id"), col("n_id"), col("rank").cast("long").as("rank"), col("d2"))
  }
}
