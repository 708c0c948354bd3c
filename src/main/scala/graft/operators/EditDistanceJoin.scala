package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Edit-distance (typo) self-join via deletion neighborhoods — FastSS
  * (Bocek et al. 2007, public method): two strings within Levenshtein
  * distance k share at least one variant obtainable by deleting ≤ k
  * characters from each (any ≤ k-edit alignment names the positions to
  * delete), so the ≤ k-deletion neighborhood is a COMPLETE candidate key
  * and a bucket equi-join + exact Levenshtein verify gives the exact
  * join — the vocabulary/entity-resolution sibling of the token-set
  * similarity family (which can't see sub-token typos at all).
  *
  * Scale shape: the neighborhood explode runs over DISTINCT words
  * (vocabulary-sized, not corpus-sized — the distinct() is the one
  * corpus-shaped aggregation), emits O(len^k) variants per word, and the
  * candidate join is an equi-join on variant with pair-dedup before the
  * codegen `levenshtein` verify (the J15 compareSimilarity-gate shape).
  */
object EditDistanceJoin {

  /** All strings from deleting AT MOST k characters of `s` (includes s). */
  private[graft] def deletions(s: String, k: Int): Set[String] = {
    var cur = Set(s)
    var all = cur
    var i = 0
    while (i < k) {
      cur = cur.flatMap(w => (0 until w.length).map(j => w.substring(0, j) + w.substring(j + 1)))
      all ++= cur
      i += 1
    }
    all
  }

  /** Exact pairs of distinct values of `wordCol` with Levenshtein ≤ k:
    * (a, b, dist), a < b.
    */
  def selfJoin(df: DataFrame, wordCol: String, k: Int): DataFrame = {
    require(k >= 1 && k <= 3, s"k must be in [1,3] (variants grow as len^k): $k")
    val spark = df.sparkSession
    import spark.implicits._
    val words = df.select(col(wordCol).cast("string").as("w"))
      .na.drop().distinct()
    val variants = words.as[String]
      .flatMap(w => deletions(w, k).iterator.map(v => (v, w)))
      .toDF("v", "w")
    val a = variants.select(col("v"), col("w").as("a"))
    val b = variants.select(col("v"), col("w").as("b"))
    a.join(b, "v")
      .filter(col("a") < col("b"))
      .select("a", "b")
      .dropDuplicates("a", "b") // dedup BEFORE the verify, J15-style
      .withColumn("dist", levenshtein(col("a"), col("b")))
      .filter(col("dist") <= k)
  }

  /** Vocabulary canonicalization: cluster the distinct values of
    * `wordCol` by Levenshtein ≤ k (typo clusters via [[selfJoin]] +
    * connected components) and map every word to its cluster's MOST
    * FREQUENT member (ties to the lexicographically smallest) — the
    * normalize-to-the-common-spelling policy entity resolution actually
    * wants, vs the dedup family's min-id representative.
    *
    * Words get distinct long ids for the numeric CC via `xxhash64(w)` —
    * CC needs DISTINCT ids, not dense ones, so a deterministic hash
    * (stable across recomputations, no cache dependency, no shuffle)
    * replaces any global-sort id assignment; at web scale a typo-laden
    * vocabulary is 10⁸⁺ rows and a single-partition `row_number` window
    * would funnel it all through one task. A vocabulary-sized collision
    * guard (one bounded agg) backs the 2⁻⁶⁴-per-pair hash assumption.
    * Output: (word, canonical, freq).
    */
  def canonicalize(df: DataFrame, wordCol: String, k: Int): DataFrame = {
    val freq = df.select(col(wordCol).cast("string").as("w"))
      .na.drop()
      .groupBy("w").agg(count(lit(1)).as("freq"))
    val ids = freq.withColumn("id", xxhash64(col("w")))
    val collided = ids
      .groupBy("id").agg(count(lit(1)).as("n"))
      .filter(col("n") > 1).limit(1).count() > 0
    require(!collided,
      "xxhash64 collision over the vocabulary — fall back to a salted re-hash")
    val pairs = selfJoin(freq, "w", k).select("a", "b")
    val edges = pairs
      .join(ids.select(col("w").as("a"), col("id").as("ida")), "a")
      .join(ids.select(col("w").as("b"), col("id").as("idb")), "b")
      .select(col("ida").as("a"), col("idb").as("b"))
    val cc = Dedup.connectedComponents(ids.select("id"), edges)
    val labeled = ids.join(cc, "id")
    val canon = labeled
      .groupBy("rep")
      .agg(min_by(col("w"), struct((-col("freq")).as("nf"), col("w"))).as("canonical"))
    labeled.join(canon, "rep")
      .select(col("w").as("word"), col("canonical"), col("freq"))
  }
}
