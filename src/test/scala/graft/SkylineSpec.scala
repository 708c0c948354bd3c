package graft

import org.apache.spark.sql.functions._

import graft.operators.Skyline

class SkylineSpec extends SparkSpec {
  init()

  import spark.implicits._

  test("hand fixture: dominated dropped, incomparable kept, exact ties both kept") {
    val pts = Seq(
      (1L, 5L, 1L), // front (best x)
      (2L, 1L, 5L), // front (best y)
      (3L, 3L, 3L), // front (incomparable with 1 and 2)
      (4L, 3L, 3L), // exact tie with 3 → neither dominates, both kept
      (5L, 2L, 2L), // dominated by 3
      (6L, 5L, 1L), // exact tie with 1 → kept
      (7L, 1L, 1L)) // dominated by everything
      .toDF("id", "x", "y")
    val got = Skyline.paretoFront(pts, "id", Seq("x", "y"))
      .select("id").as[Long].collect().toSet
    assert(got == Set(1L, 2L, 3L, 4L, 6L))
  }

  test("single dimension degenerates to the max (with ties)") {
    val pts = Seq((1L, 7L), (2L, 7L), (3L, 3L)).toDF("id", "x")
    val got = Skyline.paretoFront(pts, "id", Seq("x"))
      .select("id").as[Long].collect().toSet
    assert(got == Set(1L, 2L))
  }

  test("two-phase front equals the brute force on real criteria, any bucket count") {
    val docs = graft.core.Tables(spark, sfSmoke, "documents")
    val tk = filter(split(col("text"), " "), x => length(x) > 0)
    val crit = docs.select(col("doc_id"), tk.as("__t"))
      .select(
        col("doc_id"),
        size(col("__t")).cast("long").as("a"),
        size(array_distinct(col("__t"))).cast("long").as("b"))
      .persist()
    val rows = crit.as[(Long, Long, Long)].collect()
    val brute = rows.filter { r =>
      !rows.exists(d =>
        d._2 >= r._2 && d._3 >= r._3 && (d._2 > r._2 || d._3 > r._3))
    }.map(_._1).toSet
    Seq(1, 2, 64).foreach { b =>
      val got = Skyline.paretoFront(crit, "doc_id", Seq("a", "b"), buckets = b)
        .select("doc_id").as[Long].collect().toSet
      assert(got == brute, s"buckets=$b")
    }
    crit.unpersist()
    ()
  }
}
