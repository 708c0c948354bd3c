package graft

import org.apache.spark.sql.functions._

import graft.operators.Coreset

class CoresetSpec extends SparkSpec {
  init()

  import spark.implicits._

  private lazy val emb = spark.read.parquet(s"$sfSmoke/embeddings.parquet")

  test("greedy k-center equals the driver-side farthest-point traversal") {
    val k = 6
    val got = Coreset.kCenters(emb, "vec_id", "embedding", k)
      .as[(Long, Long, Double)].collect().sortBy(_._1)

    // naive reference on collected vectors
    val all = emb.select(col("vec_id").cast("long"),
        transform(col("embedding"), x => x.cast("double")))
      .as[(Long, Seq[Double])].collect().sortBy(_._1)
    def d2(a: Seq[Double], b: Seq[Double]): Double =
      a.zip(b).foldLeft(0.0) { case (acc, (x, y)) => acc + (x - y) * (x - y) }
    var centers = Vector(all.head._2)
    var want = Vector((1L, all.head._1, 0.0))
    (2 to k).foreach { r =>
      val (id, vec, d) = all.map { case (id, v) =>
        (id, v, centers.map(c => d2(v, c)).min)
      }.maxBy { case (id, _, d) => (d, -id) }
      centers :+= vec
      want :+= ((r.toLong, id, d))
    }
    got.zip(want).foreach { case ((gr, gi, gd), (wr, wi, wd)) =>
      assert(gr == wr && gi == wi, s"rank $wr: got id $gi want $wi")
      assert(math.abs(gd - wd) < 1e-9, s"rank $wr: got d2 $gd want $wd")
    }
    // the Gonzalez radius sequence is non-increasing after the seed
    got.drop(1).sliding(2).foreach {
      case Array((_, _, a), (_, _, b)) => assert(b <= a + 1e-12)
      case _                           => ()
    }
  }

  test("deterministic: repeated runs select identical centers") {
    val a = Coreset.kCenters(emb, "vec_id", "embedding", 4)
      .as[(Long, Long, Double)].collect().toSeq
    val b = Coreset.kCenters(emb, "vec_id", "embedding", 4)
      .as[(Long, Long, Double)].collect().toSeq
    assert(a == b)
  }

  test("k_centers TVF matches the operator") {
    emb.createOrReplaceTempView("kc_emb")
    val sqlDf = spark.sql("SELECT * FROM k_centers('kc_emb', 'vec_id', 'embedding', 4)")
    val scalaDf = Coreset.kCenters(spark.table("kc_emb"), "vec_id", "embedding", 4)
    assert(sqlDf.columns.toSeq == scalaDf.columns.toSeq)
    assert(sqlDf.exceptAll(scalaDf).isEmpty && scalaDf.exceptAll(sqlDf).isEmpty)
  }
}
