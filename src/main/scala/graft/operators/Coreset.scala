package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Diversity-maximizing coreset selection — greedy k-center (Gonzalez
  * 1985; the farthest-point traversal, a 2-approximation to the optimal
  * k-center radius): seed with the minimum id, then k−1 times select the
  * point FARTHEST from its nearest already-chosen center. The
  * training-data-curation use is diverse subset selection — k exemplars
  * that cover the embedding space, the complement of near-dup removal
  * (dedup trims redundancy; k-center picks the spanning skeleton for
  * fine-tuning sets, eval suites, or annotation batches).
  *
  * Scale shape: k rounds, each ONE full scan — the ≤ k chosen vectors
  * ride the plan as broadcast literals (driver memory is k·dim doubles,
  * bounded by construction) and the per-round argmax is a global top-1
  * (`orderBy(desc, id).limit(1)` — Spark's TakeOrderedAndProject, a
  * per-partition reduce + driver merge, never a full sort). Total cost
  * O(k²·n·dim) multiply-adds: stateless recompute of the min-distance
  * per round keeps every round a pure scan (no per-point carried state
  * to checkpoint); a deployment with k in the hundreds would carry the
  * running min per point instead (one localCheckpoint per round,
  * O(k·n·dim)) — same outputs, traded for state.
  *
  * Exactness: distances are ⌊IEEE⌋-deterministic — Σ(x−y)² folded in
  * index order (the q22/q24-proven cross-engine float discipline), ties
  * on the argmax break to the smaller id, and the seed is the minimum
  * id, so the selection is a pure function of the input and an oracle
  * replays it round for round.
  *
  * Output: (rank, id, d2) — rank 1..k in selection order, d2 = squared
  * distance to the nearest PRIOR center at selection time (0 for the
  * seed; non-increasing in rank — the Gonzalez radius sequence, so
  * `max(d2) over later ranks` certifies the covering radius).
  */
object Coreset {

  private def d2To(emb: Column, center: Array[Double]): Column =
    aggregate(
      zip_with(emb, typedLit(center.toSeq), (x, y) => (x - y) * (x - y)),
      lit(0.0),
      (acc, x) => acc + x)

  def kCenters(
      vectors: DataFrame,
      idCol: String,
      embCol: String,
      k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    val spark = vectors.sparkSession
    val v = vectors
      .select(
        col(idCol).cast("long").as("id"),
        transform(col(embCol), x => x.cast("double")).as("emb"))
      .localCheckpoint(true) // k scans read cached blocks, not the source
    val seed = v.orderBy("id").limit(1).head()
    val out = collection.mutable.ArrayBuffer(
      (1, seed.getLong(0), 0.0))
    var centers = Vector(seed.getSeq[Double](1).toArray)
    var r = 2
    while (r <= k) {
      val minD = centers.map(c => d2To(col("emb"), c)).reduce(least(_, _))
      val next = v
        .select(col("id"), col("emb"), minD.as("d2"))
        .orderBy(desc("d2"), col("id"))
        .limit(1)
        .head()
      out += ((r, next.getLong(0), next.getDouble(2)))
      centers :+= next.getSeq[Double](1).toArray
      r += 1
    }
    import spark.implicits._
    out.toSeq.toDF("rank", "id", "d2")
      .select(col("rank").cast("long").as("rank"), col("id"), col("d2"))
  }
}
