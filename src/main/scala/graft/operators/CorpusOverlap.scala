package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cross-source corpus overlap matrix — the "how much of dump B is already
  * in dump A" report that decides whether a new crawl/source is worth
  * ingesting and which pairs need a cross-source dedup pass. For every
  * pair of sources it reports the exact distinct-k-shingle overlap:
  * |A∩B|, |A|, |B|, Jaccard and both directed containments, all in exact
  * integer basis points.
  *
  * Scale shape: the corpus shuffles ONCE, on the 8-byte xxhash64 of each
  * shingle (never the shingle text — at 100 TB the key width is the
  * shuffle), pre-shrunk by a map-side distinct on (group, hash). Each
  * distinct shingle then folds to its sorted set of sources (bounded by
  * the group cardinality s, e.g. crawls/dumps — tens, not millions) and
  * fans out to at most C(s,2) pair rows; the final count per pair is a
  * map-side-combinable sum over s²-bounded keys. Nothing is ever
  * all-pairs over documents. For s large enough that C(s,2) fan-out per
  * hot shingle matters, band the groups and run the matrix per band pair.
  *
  * Pairs with zero shared shingles do not appear (inner semantics) —
  * emitting the zero rows would force an s² crossjoin for information the
  * absence already carries.
  *
  * Shingle identity is the 64-bit hash: two distinct shingles colliding
  * would merge their source sets — probability ≤ distinct²·2⁻⁶⁴, the
  * same vanishing bound accepted across the shingle family
  * (cf. SubstringDedup).
  */
object CorpusOverlap {

  /** Overlap matrix over k-token shingles.
    *
    * Output: (src_a, src_b, common, n_a, n_b, jaccard_bp,
    * contain_a_bp, contain_b_bp) with src_a < src_b;
    * contain_a_bp = ⌊10000·|A∩B| / |A|⌋ ("share of A also in B").
    * k = 1 degrades to distinct-token overlap.
    */
  def overlapMatrix(
      docs: DataFrame,
      groupCol: String,
      textCol: String,
      k: Int): DataFrame = {
    require(k >= 1, s"shingle width must be ≥ 1: $k")
    val toks = filter(split(col(textCol), " "), (x: Column) => length(x) > 0)
    val grams = docs
      .select(col(groupCol).as("g"), toks.as("ts"))
      .filter(size(col("ts")) >= k)
      .select(
        col("g"),
        explode(expr(
          s"transform(sequence(0, size(ts) - $k), i -> xxhash64(array_join(slice(ts, i + 1, $k), ' ')))"))
          .as("h"))
      .distinct()
    val perGroup = grams.groupBy("g").agg(count(lit(1)).as("n"))
    // distinct shingle -> its (bounded, sorted) source set -> pair fan-out
    val pairs = grams
      .groupBy("h")
      .agg(sort_array(collect_set(col("g"))).as("gs"))
      .filter(size(col("gs")) >= 2)
      .select(explode(expr(
        """flatten(transform(gs, (a, i) ->
          |  transform(slice(gs, i + 2, size(gs)), b -> struct(a AS a, b AS b))))"""
          .stripMargin)).as("p"))
      .groupBy(col("p.a").as("src_a"), col("p.b").as("src_b"))
      .agg(count(lit(1)).as("common"))
    pairs
      .join(broadcast(perGroup.select(col("g").as("src_a"), col("n").as("n_a"))), "src_a")
      .join(broadcast(perGroup.select(col("g").as("src_b"), col("n").as("n_b"))), "src_b")
      .withColumn("jaccard_bp",
        expr("(10000 * common) div (n_a + n_b - common)"))
      .withColumn("contain_a_bp", expr("(10000 * common) div n_a"))
      .withColumn("contain_b_bp", expr("(10000 * common) div n_b"))
      .select(
        "src_a", "src_b", "common", "n_a", "n_b",
        "jaccard_bp", "contain_a_bp", "contain_b_bp")
  }
}
