package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Blocking-scheme quality for entity resolution — the two numbers that
  * decide whether a blocking key is usable BEFORE anyone materializes a
  * candidate pair (Christen 2012): REDUCTION RATIO (what fraction of the
  * n(n−1)/2 all-pairs space the blocks prune away) and PAIRS
  * COMPLETENESS (what fraction of true-match pairs the blocks keep
  * co-blocked). A key with high reduction and low completeness silently
  * loses matches; the reverse explodes the verify stage — this report is
  * how [[RecordLinkage]]'s blocking arm gets chosen.
  *
  * Everything derives from SIZE HISTOGRAMS — pairs are counted as
  * Σ s(s−1)/2 over block sizes, truth-cluster sizes, and
  * (cluster × block) contingency cells — so no pair relation ever
  * materializes and the cost is two grouped counts plus a join at
  * id grain. Exact integers (DECIMAL(38,0) products, bp floors).
  * Assumes one block per id (the contingency cell count would
  * double-count multi-blocked pairs otherwise — enforced by name).
  *
  * Output: one row (n, truth_pairs, cand_pairs, coblocked_truth_pairs,
  * completeness_bp, reduction_bp).
  */
object BlockingQuality {

  /** `blocks`: (idCol, blockCol), one row per id. `clusters`:
    * (idCol, clusterCol) ground-truth assignment, one row per id.
    */
  def report(
      blocks: DataFrame,
      clusters: DataFrame,
      idCol: String,
      blockCol: String,
      clusterCol: String): DataFrame = {
    val b = blocks.select(col(idCol).as("id"), col(blockCol).cast("string").as("blk"))
    val c = clusters.select(col(idCol).as("id"), col(clusterCol).cast("string").as("cl"))
    val dupGuard = b.groupBy("id").agg(count(lit(1)).as("k"))
      .agg(count(when(col("k") > 1,
        raise_error(concat(
          lit("BlockingQuality.report: one block per id required, id "),
          col("id").cast("string"), lit(" has "), col("k").cast("string")))))
        .as("__probe"))
    def pairSum(df: DataFrame, keys: Seq[String]): DataFrame =
      df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("s"))
        .agg(coalesce(
          sum(expr("(CAST(s AS DECIMAL(38,0)) * (s - 1)) div 2")), lit(0L))
          .cast("decimal(38,0)").as("p"))
    val n = b.agg(count(lit(1)).cast("decimal(38,0)").as("n"))
    val candP = pairSum(b, Seq("blk")).select(col("p").as("cand_pairs"))
    val truthP = pairSum(c, Seq("cl")).select(col("p").as("truth_pairs"))
    val bothP = pairSum(b.join(c, "id"), Seq("cl", "blk"))
      .select(col("p").as("coblocked_truth_pairs"))
    n.crossJoin(candP).crossJoin(truthP).crossJoin(bothP)
      .crossJoin(broadcast(dupGuard)).filter(col("__probe") >= 0).drop("__probe")
      .select(
        col("n").cast("long").as("n"),
        col("truth_pairs").cast("long").as("truth_pairs"),
        col("cand_pairs").cast("long").as("cand_pairs"),
        col("coblocked_truth_pairs").cast("long").as("coblocked_truth_pairs"),
        expr(
          """CASE WHEN truth_pairs = 0 THEN CAST(10000 AS BIGINT)
            |ELSE (10000 * coblocked_truth_pairs) div truth_pairs END"""
            .stripMargin).as("completeness_bp"),
        expr(
          """CASE WHEN n < 2 THEN CAST(10000 AS BIGINT)
            |ELSE 10000 - (10000 * cand_pairs)
            |     div ((n * (n - 1)) div 2) END""".stripMargin)
          .as("reduction_bp"))
  }
}
