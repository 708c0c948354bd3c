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

  test("anti-correlated corpus (front = n) survives the no-broadcast path intact") {
    // every point lies on the front: (x, -x) — no pair dominates. A tiny
    // broadcastLimit forces the block-partitioned exact pass (round-10
    // verdict: the unguarded survivor broadcast was corpus-sized here)
    val pts = (1L to 200L).map(i => (i, i, -i)).toDF("id", "x", "y")
    val got = Skyline.paretoFront(pts, "id", Seq("x", "y"),
        buckets = 8, broadcastLimit = 10L)
      .select("id").as[Long].collect().toSet
    assert(got == (1L to 200L).toSet)
  }

  test("no-broadcast path equals brute force on a mixed fixture, and hints stay out") {
    // half anti-correlated (front), half dominated interior points
    val pts = ((1L to 100L).map(i => (i, 2 * i, 400L - 2 * i)) ++
      (101L to 200L).map(i => (i, i - 100L, i - 100L))).toDF("id", "x", "y")
    val rows = pts.as[(Long, Long, Long)].collect()
    val brute = rows.filter { r =>
      !rows.exists(d => d._2 >= r._2 && d._3 >= r._3 && (d._2 > r._2 || d._3 > r._3))
    }.map(_._1).toSet
    val guarded = Skyline.paretoFront(pts, "id", Seq("x", "y"),
      buckets = 4, broadcastLimit = 10L)
    val got = guarded.select("id").as[Long].collect().toSet
    assert(got == brute)
    // under the guard no relation is force-broadcast — an adversarial
    // front would be corpus-sized, so any hint here is a scale bug
    val hinted = guarded.queryExecution.analyzed.collect {
      case h: org.apache.spark.sql.catalyst.plans.logical.ResolvedHint => h
      case h: org.apache.spark.sql.catalyst.plans.logical.UnresolvedHint => h
    }
    assert(hinted.isEmpty, s"forced broadcast under the guard:\n${hinted.mkString("\n")}")
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
