package graft

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.operators.Clustering

class ClusteringSpec extends SparkSpec {
  init()

  private lazy val vecs = Tables(spark, sfSmoke, "embeddings")
    .select(col("vec_id").as("vid"), col("embedding").as("emb"))

  /** Lloyd objective measured against each assignment's OWN cluster means
    * (the rational (sum, count) centroid), on the quantized grid.
    */
  private def objective(assign: Map[Long, Long], q: Map[Long, Array[Long]]): Double = {
    assign.groupBy(_._2).values.map { members =>
      val ids = members.keys.toArray
      val cnt = ids.length.toLong
      val dims = q(ids.head).length
      val s = Array.ofDim[Long](dims)
      ids.foreach(id => { val v = q(id); var i = 0; while (i < dims) { s(i) += v(i); i += 1 } })
      ids.map { id =>
        val v = q(id)
        var num = 0L
        var i = 0
        while (i < dims) { val d = cnt * v(i) - s(i); num += d * d; i += 1 }
        num.toDouble / (cnt * cnt).toDouble
      }.sum
    }.sum
  }

  test("kmeans: deterministic, exhaustive, k cells, objective non-increasing") {
    val q = vecs
      .select(col("vid"), transform(col("emb"), x => floor(x.cast("double") * 1024 + 0.5).cast("long")).as("qe"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap

    val byIters = (0 to 2).map { it =>
      it -> Clustering.kmeansAssign(vecs, k = 8, iters = it)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }.toMap
    // exhaustive + bounded cells
    byIters.values.foreach { a =>
      assert(a.size == q.size)
      assert(a.values.forall(c => c >= 1 && c <= 8))
    }
    // rerun equality (no RNG, no shuffle-order dependence)
    val rerun = Clustering.kmeansAssign(vecs, k = 8, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rerun == byIters(2))
    // Lloyd: each extra round can only improve the own-means objective
    val obj = (0 to 2).map(it => objective(byIters(it), q))
    assert(obj(1) <= obj(0) + 1e-9, obj.toString)
    assert(obj(2) <= obj(1) + 1e-9, obj.toString)
  }

  test("cell_n matches the actual cell population") {
    val out = Clustering.kmeansAssign(vecs, k = 8, iters = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val sizes = out.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    out.foreach { case (_, cell, n) => assert(n == sizes(cell)) }
  }
}
