package graft

import graft.core.Materialize
import graft.operators.PrefixSum

class MaterializeSpec extends SparkSpec {
  init()
  import spark.implicits._

  private def policy(v: Option[String])(body: => Unit): Unit = {
    val key = "spark.graft.materialize.policy"
    val before = spark.conf.getOption(key)
    v match {
      case Some(p) => spark.conf.set(key, p)
      case None    => spark.conf.unset(key)
    }
    try body
    finally {
      before match {
        case Some(p) => spark.conf.set(key, p)
        case None    => spark.conf.unset(key)
      }
    }
  }

  test("default (local) policy materializes eagerly and preserves values") {
    val df = (1 to 100).toDF("x")
    val out = Materialize(df)
    assert(out.as[Int].collect().sorted.toSeq == (1 to 100))
  }

  test("reliable policy without a checkpoint dir fails by name") {
    policy(Some("reliable")) {
      val ex = intercept[IllegalArgumentException] {
        Materialize((1 to 3).toDF("x"))
      }
      assert(ex.getMessage.contains("spark.graft.checkpoint.dir"))
    }
  }

  test("reliable policy checkpoints through the configured dir; operators run under it") {
    val dir = java.nio.file.Files.createTempDirectory("graft-mat-ckpt-")
    spark.conf.set("spark.graft.checkpoint.dir", dir.toString)
    policy(Some("reliable")) {
      // a direct materialization round-trips...
      assert(Materialize((1 to 50).toDF("x")).as[Int].collect().sorted.toSeq
        == (1 to 50))
      // ...and an iterative operator built on Materialize (the recursive
      // prefix sum, 2 levels at blockSize 8) is value-identical under it
      val kv = (0 until 64).map(i => (i.toLong, (i % 5 + 1).toLong)).toDF("k", "s")
      val got = PrefixSum.exclusive(kv, blockSize = 8)
        .orderBy("k").as[(Long, Long)].collect().toSeq
      val want = (0 until 64).scanLeft(0L)((acc, i) => acc + (i % 5 + 1)).init
        .zipWithIndex.map { case (b, i) => (i.toLong, b) }
      assert(got == want)
      assert(spark.sparkContext.getCheckpointDir.exists(_.contains(dir.getFileName.toString)))
    }
  }

  test("an unknown policy fails by name") {
    policy(Some("turbo")) {
      val ex = intercept[IllegalArgumentException] {
        Materialize((1 to 3).toDF("x"))
      }
      assert(ex.getMessage.contains("spark.graft.materialize.policy"))
    }
  }
}
