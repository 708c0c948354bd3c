package graft

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.operators.Pq

class PqSpec extends SparkSpec {
  init()

  import spark.implicits._

  private lazy val emb = Tables(spark, sfSmoke, "embeddings")
  private lazy val vecs = emb.select(col("vec_id").as("vid"), col("embedding").as("emb"))

  test("codebooks and codes have the contract shape") {
    val books = Pq.trainCodebooks(vecs, 64, 4, 16, iters = 1)
    val b = books.collect()
    assert(b.length == 64) // 4 subs × 16 cells
    assert(b.forall(_.getSeq[Long](2).length == 16)) // subDim centroids
    val codes = Pq.encode(vecs, books, 64, 4)
    val c = codes.collect()
    assert(c.length == vecs.count())
    assert(c.forall { r =>
      val cs = r.getSeq[Int](1)
      cs.length == 4 && cs.forall(x => x >= 1 && x <= 16)
    })
  }

  test("training is partition-invariant (deterministic codebooks)") {
    val a = Pq.trainCodebooks(vecs, 64, 4, 8, iters = 2)
      .orderBy("sub", "cell").collect().toSeq
    val b = Pq.trainCodebooks(vecs.repartition(13), 64, 4, 8, iters = 2)
      .orderBy("sub", "cell").collect().toSeq
    assert(a == b)
  }

  test("ADC distance equals the reconstruction distance, recomputed driver-side") {
    val books = Pq.trainCodebooks(vecs, 64, 4, 16, iters = 1)
    val codes = Pq.encode(vecs, books, 64, 4)
    val q = emb.filter(col("vec_id") < 3)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val adc = Pq.adcTopK(q, books, codes, 5, 64, 4)
      .as[(Long, Long, Long, Long)].collect()
    // driver-side recomputation: quantize, look up each neighbor's
    // reconstruction from its codes, sum integer squared distances
    val bookMap = books.collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getSeq[Long](2)).toMap
    val codeMap = codes.collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    val qMap = emb.filter(col("vec_id") < 3)
      .select(col("vec_id"), col("embedding")).as[(Long, Seq[Float])].collect()
      .map { case (id, e) =>
        id -> e.map(x => math.floor(x.toDouble * 1024 + 0.5).toLong)
      }.toMap
    adc.foreach { case (qid, nid, _, d2) =>
      val qq = qMap(qid)
      val recon = codeMap(nid).zipWithIndex.flatMap { case (cell, sub) =>
        bookMap((sub, cell))
      }
      val expect = qq.zip(recon).map { case (a, b) => (a - b) * (a - b) }.sum
      assert(d2 == expect, s"q=$qid n=$nid")
    }
  }

  test("planted exact copies retrieve their source through ADC") {
    val copies = vecs.filter(col("vid") < 10)
      .select((col("vid") + 10000).as("q_id"), col("emb").as("q_emb"))
    val books = Pq.trainCodebooks(vecs, 64, 4, 16, iters = 2)
    val codes = Pq.encode(vecs, books, 64, 4)
    val got = Pq.adcTopK(copies, books, codes, 10, 64, 4)
      .select("q_id", "n_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    (10000L until 10010L).foreach { q =>
      // an exact copy shares every subvector with its source, so its
      // ADC distance to the source's codes is the source's own
      // quantization residue — among the smallest in the corpus
      assert(got(q).contains(q - 10000), s"copy $q missed its source")
    }
  }

  test("IVF-PQ with full probe width equals plain ADC; pruned probes score identically") {
    val corpus = emb.select(col("vec_id").as("n_id"), col("embedding").as("n_emb"))
    val (cents, assigned) =
      graft.operators.SimilaritySearch.buildIvfIndex(corpus, 8)
    val books = Pq.trainCodebooks(vecs, 64, 4, 16, iters = 1)
    val codes = Pq.encode(vecs, books, 64, 4)
    val q = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val adc = Pq.adcTopK(q, books, codes, 10, 64, 4)
      .orderBy("q_id", "rank").collect().toSeq
    // probing EVERY cell removes the pruning: identical result
    val full = Pq.ivfPqTopK(q, cents, assigned.select("n_id", "cell"), books, codes,
        10, 64, 4, nProbe = 8)
      .orderBy("q_id", "rank").collect().toSeq
    assert(full == adc)
    // pruned probes: a strict candidate subset, but every returned pair
    // carries the same d2 the full ADC assigns it
    val pruned = Pq.ivfPqTopK(q, cents, assigned.select("n_id", "cell"), books, codes,
        10, 64, 4, nProbe = 2)
      .select("q_id", "n_id", "d2")
    val fullD2 = Pq.adcTopK(q, books, codes, 2000, 64, 4).select("q_id", "n_id", "d2")
    assert(pruned.join(fullD2, Seq("q_id", "n_id", "d2")).count() == pruned.count())
  }
}
