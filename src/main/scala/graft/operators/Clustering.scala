package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** K-means clustering over an embedding corpus (Lloyd's algorithm, fixed
  * iteration count) — the grouping pass behind cluster-balanced sampling
  * and diversity-aware curation of training data (cf. the cluster step of
  * SemDeDup and density-based selection pipelines).
  *
  * Every decision is exact-integer math so ANY engine replays assignments
  * bit-for-bit (no shuffle-order FP drift, no fold-order drift):
  *
  *   - vectors quantize once to an integer grid: q_i = floor(x_i·2^bits + ½)
  *     (float→double is exact, ·2^bits is exact, so the grid is
  *     engine-independent);
  *   - a centroid is the rational (s, cnt) — the per-dimension integer SUM
  *     of its members and the member count, never a floating mean. Integer
  *     sums commute, so the update is exact under any execution order;
  *   - distance to centroid j: Σ_i (cnt_j·q_i − s_j,i)² / cnt_j² — an exact
  *     integer numerator and ONE IEEE division at the end. Both operands
  *     stay below 2^53, so the double is the correctly-rounded rational in
  *     every engine and the (d2, cell) argmin is deterministic.
  *
  * Scale shape: centroids are a k-row broadcast; assignment is one
  * corpus-linear pass (corpus × k broadcast products, min_by aggregation);
  * the update is a posexplode → groupBy(cell, dim) partial-aggregated sum
  * (k·dim result rows). Per iteration: one broadcast scan + one bounded
  * shuffle. Initial centroids are the MD5-ordered deterministic sample
  * used across the IVF family. Empty cells drop out (standard Lloyd).
  */
object Clustering {

  private def quantize(emb: Column, bits: Int): Column =
    transform(emb, x => floor(x.cast("double") * (1L << bits) + 0.5).cast("long"))

  /** Exact squared distance numerator Σ (cnt·q − s)², then the single
    * division by cnt² — see class doc for why this is engine-portable.
    */
  private def d2(qe: Column, s: Column, cnt: Column): Column =
    aggregate(
      zip_with(qe, s, (a, b) => (cnt * a - b) * (cnt * a - b)),
      lit(0L),
      (acc, x) => acc + x).cast("double") / (cnt * cnt).cast("double")

  /** Run `iters` Lloyd rounds from the deterministic seed sample and return
    * the final assignment: (vid, cell, cell_n, vecs ordered by vid join
    * back outside if needed). Output: (vid, cell, cell_n).
    */
  def kmeansAssign(
      vectors: DataFrame, // (vid, emb) — float or double array
      k: Int,
      iters: Int,
      quantBits: Int = 10): DataFrame = {
    require(k > 0 && iters >= 0, s"kmeansAssign: need k > 0, iters >= 0; got k=$k iters=$iters")
    val q = vectors
      .select(col("vid"), quantize(col("emb"), quantBits).as("qe"))

    // deterministic seed: MD5-ordered sample, cnt = 1, s = the vector itself
    val idHash = md5(col("c_src").cast("string"))
    var cents = q
      .select(col("vid").as("c_src"), col("qe").as("s"))
      .orderBy(md5(col("c_src").cast("string")), col("c_src"))
      .limit(k)
      .withColumn("cell", row_number().over(Window.orderBy(idHash, col("c_src"))))
      .select(col("cell"), col("s"), lit(1L).as("cnt"))

    def assign(c: DataFrame): DataFrame =
      q.crossJoin(broadcast(c))
        .withColumn("d2", d2(col("qe"), col("s"), col("cnt")))
        .groupBy("vid")
        .agg(
          first(col("qe")).as("qe"),
          min_by(col("cell"), struct(col("d2"), col("cell"))).as("cell"))

    var assigned = assign(cents)
    for (_ <- 1 to iters) {
      cents = assigned
        .select(col("cell"), posexplode(col("qe")).as(Seq("dim", "v")))
        .groupBy("cell", "dim")
        .agg(sum("v").as("sv"), count(lit(1)).as("cnt"))
        .groupBy("cell")
        .agg(
          transform(
            array_sort(collect_list(struct(col("dim"), col("sv")))),
            s => s.getField("sv")).as("s"),
          first(col("cnt")).as("cnt"))
      assigned = assign(cents)
    }

    // cell sizes as a k-row broadcast join, not a window: a window
    // partitioned by cell funnels the whole corpus through k partitions
    val sizes = assigned.groupBy("cell").agg(count(lit(1)).as("cell_n"))
    assigned
      .join(broadcast(sizes), "cell")
      .select(col("vid"), col("cell").cast("long").as("cell"), col("cell_n"))
  }
}
