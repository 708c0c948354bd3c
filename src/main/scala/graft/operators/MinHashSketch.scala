package graft.operators

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed MinHash-sketch aggregator (SURVEY §2.10 — the Aggregator/UDAF
  * surface): folds a GROUP of token sets into one k-value MinHash sketch
  * (element-wise minimum of per-record sketches). Sketch union is exactly
  * element-wise min, so the aggregate is associative/commutative and
  * map-side combines — the streaming-friendly way to keep an incremental
  * similarity sketch per group (e.g. per source, per dup-cluster) without
  * retaining the token sets.
  *
  * `estimateJaccard(a, b)` = fraction of agreeing components — the
  * standard unbiased MinHash estimator.
  */
final class MinHashSketch(k: Int)
    extends Aggregator[Seq[String], Array[Long], Array[Long]] {

  override def zero: Array[Long] = Array.fill(k)(Long.MaxValue)

  override def reduce(buf: Array[Long], toks: Seq[String]): Array[Long] = {
    var j = 0
    while (j < k) {
      var m = buf(j)
      toks.foreach { t =>
        val h = MinHashSketch.hash(j, t)
        if (h < m) m = h
      }
      buf(j) = m
      j += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var j = 0
    while (j < k) { if (b(j) < a(j)) a(j) = b(j); j += 1 }
    a
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()

  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}

object MinHashSketch {

  /** Seeded 64-bit hash matching the spirit of the expression-side
    * `xxhash64(j, token)` MinHash (not bit-compatible — the sketch is a
    * self-contained aggregate, compared only against itself).
    */
  def hash(seed: Int, t: String): Long = {
    var h = 1125899906842597L ^ (seed * 0x9E3779B97F4A7C15L)
    var i = 0
    while (i < t.length) { h = 31 * h + t.charAt(i); i += 1 }
    h
  }

  def estimateJaccard(a: Array[Long], b: Array[Long]): Double = {
    require(a.length == b.length)
    var same = 0
    var j = 0
    while (j < a.length) { if (a(j) == b(j)) same += 1; j += 1 }
    same.toDouble / a.length
  }
}
