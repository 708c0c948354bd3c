package graft

import org.apache.spark.sql.functions._

import graft.streaming.ReplayLogJoin

class ReplayLogJoinSpec extends SparkSpec {
  init()
  import spark.implicits._

  test("offset provenance equals the publish-layout formula, including an empty file group") {
    // keys chosen so at least one (partition, file) group is EMPTY —
    // the empty file must still publish so actual sequence numbers stay
    // aligned with the formula.
    val feed = Seq(
      (1L, 10L), (2L, 11L), (11L, 12L), (12L, 10L), (13L, 11L),
      (21L, 14L), (30L, 15L), (15L, 14L)) // v%3: 1,2,0,1,2,2,0,2
      .toDF("k", "v")
    val stored = Seq((10L, "a"), (11L, "b"), (12L, "c"), (14L, "d"), (15L, "e"))
      .toDF("sk", "sv")
    val got = ReplayLogJoin.run(feed, stored, "sk")
      .select("k", "v", "log_part", "file_seq", "line_no", "sv")
      .as[(Long, Long, Int, Long, Long, String)].collect().toSet

    val rows = Seq(
      (1L, 10L), (2L, 11L), (11L, 12L), (12L, 10L), (13L, 11L),
      (21L, 14L), (30L, 15L), (15L, 14L))
    val svOf = Map(10L -> "a", 11L -> "b", 12L -> "c", 14L -> "d", 15L -> "e")
    val want = rows.map { case (k, v) =>
      val p = (v % 3).toInt
      val f = (k / 10) % 2 + 1
      (k, v, p, f)
    }.groupBy { case (_, _, p, f) => (p, f) }.toSeq.flatMap { case (_, grp) =>
      grp.sortBy(_._1).zipWithIndex.map { case ((k, v, p, f), i) =>
        (k, v, p, f, i.toLong, svOf(v))
      }
    }.toSet
    assert(got == want, s"got=$got\nwant=$want")
    // the empty-group case is actually exercised
    val present = want.map { case (_, _, p, f, _, _) => (p, f) }
    val empties = (for { p <- 0 to 2; f <- 1L to 2L } yield (p, f))
      .filterNot(present.contains)
    assert(empties.nonEmpty, "fixture must leave some (partition, file) group empty")
  }
}
