package graft

import org.apache.spark.sql.functions._

import graft.operators.SimilaritySearch

class QuantizationSpec extends SparkSpec {
  init()
  import spark.implicits._

  private lazy val emb = graft.core.Tables(spark, sfSmoke, "embeddings")

  test("int8 codes: range, reconstruction bound, zero-vector handling") {
    val q = SimilaritySearch.quantizeInt8(
      emb.unionByName(Seq((999999L, Seq.empty[Float])).toDF("vec_id", "embedding")
        .withColumn("embedding", col("embedding").cast("array<float>"))
        .select(col("vec_id"), col("embedding"), lit(0).as("label"))
        .select("vec_id", "embedding", "label")),
      "vec_id", "embedding")
    val rows = q.join(emb.select(col("vec_id"), col("embedding")), Seq("vec_id"))
      .select("vec_id", "scale", "codes", "embedding")
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val scale = r.getDouble(1)
      val codes = r.getSeq[Int](2)
      val xs = r.getSeq[Float](3)
      assert(codes.forall(c => c >= -127 && c <= 127))
      assert(scale >= 0.0)
      if (scale > 0) {
        // symmetric quantization: |x − code·scale/127| ≤ half a step
        codes.zip(xs).foreach { case (c, x) =>
          assert(math.abs(x.toDouble - c * scale / 127.0) <= scale / 254.0 + 1e-9,
            s"vec ${r.getLong(0)}: x=$x c=$c scale=$scale")
        }
      }
    }
    // the appended empty vector: scale 0, no codes
    val zv = q.filter(col("vec_id") === 999999L).collect()(0)
    assert(zv.getDouble(1) == 0.0 && zv.getSeq[Int](2).isEmpty)
  }

  test("quantized top-k equals a driver-side brute force over the codes") {
    val codes = SimilaritySearch.quantizeInt8(emb, "vec_id", "embedding")
      .select("vec_id", "codes").as[(Long, Seq[Int])].collect().toMap
    def cos(a: Seq[Int], b: Seq[Int]): Double = {
      val d = a.zip(b).map { case (x, y) => x.toLong * y }.sum
      val na = a.map(x => x.toLong * x).sum
      val nb = b.map(x => x.toLong * x).sum
      if (na == 0 || nb == 0) 0.0 else d.toDouble / math.sqrt((na * nb).toDouble)
    }
    val queries = codes.keys.filter(_ < 5).toSeq.sorted
    val want = queries.flatMap { q =>
      codes.toSeq.filter(_._1 != q)
        .map { case (n, c) => (q, n, cos(codes(q), c)) }
        .sortBy { case (_, n, s) => (-s, n) }
        .take(8).zipWithIndex
        .map { case ((_, n, _), i) => (q, n, i + 1) }
    }.toSet
    val codesDf = SimilaritySearch.quantizeInt8(emb, "vec_id", "embedding")
    val got = SimilaritySearch.quantizedTopK(
        codesDf.filter(col("vec_id") < 5)
          .select(col("vec_id").as("q_id"), col("codes").as("q_codes")),
        codesDf.select(col("vec_id").as("n_id"), col("codes").as("n_codes")),
        8)
      .select("q_id", "n_id", "rank").as[(Long, Long, Int)].collect()
      .map(r => (r._1, r._2, r._3)).toSet
    assert(got == want)
  }
}
