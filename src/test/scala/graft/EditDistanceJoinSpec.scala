package graft

import graft.operators.EditDistanceJoin

/** FastSS completeness against a brute-force Levenshtein oracle on
  * random-ish strings (substitutions, insertions, deletions, transposes),
  * plus the deletion-neighborhood unit contract.
  */
class EditDistanceJoinSpec extends SparkSpec {
  init()
  import spark.implicits._

  test("deletion neighborhoods") {
    assert(EditDistanceJoin.deletions("ab", 1) == Set("ab", "a", "b"))
    assert(EditDistanceJoin.deletions("abc", 2) ==
      Set("abc", "ab", "ac", "bc", "a", "b", "c"))
    assert(EditDistanceJoin.deletions("a", 2) == Set("a", ""))
  }

  test("selfJoin equals brute force for k=1 and k=2") {
    val words = Seq(
      "spark", "sparc", "spank", "park", "sparks", "mark", "table", "cable",
      "tale", "stable", "scan", "span", "plan", "a", "ab", "b")
    def lev(x: String, y: String): Int = {
      val d = Array.tabulate(x.length + 1, y.length + 1)((i, j) => if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to x.length; j <- 1 to y.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (x(i - 1) == y(j - 1)) 0 else 1))
      d(x.length)(y.length)
    }
    for (k <- Seq(1, 2)) {
      val want = (for {
        a <- words; b <- words if a < b && lev(a, b) <= k
      } yield (a, b, lev(a, b).toLong)).sorted
      val got = EditDistanceJoin.selfJoin(words.toDF("w"), "w", k)
        .orderBy("a", "b")
        .as[(String, String, Int)].collect().toSeq
        .map(t => (t._1, t._2, t._3.toLong))
      assert(got == want, s"k=$k: got $got want $want")
      assert(want.nonEmpty)
    }
  }

  test("canonicalize maps typo clusters to the most frequent spelling") {
    // "spark" x5 dominates its cluster {spark, sparc, spank, park};
    // "table" x3 dominates {table, cable, tale}; "zebra" isolated
    val words = Seq.fill(5)("spark") ++ Seq("sparc", "spank", "park") ++
      Seq.fill(3)("table") ++ Seq("cable", "tale", "zebra")
    val got = EditDistanceJoin.canonicalize(words.toDF("w"), "w", k = 2)
      .orderBy("word")
      .as[(String, String, Long)].collect().toSeq
    val canon = got.map(r => r._1 -> r._2).toMap
    assert(canon("sparc") == "spark" && canon("spank") == "spark" && canon("park") == "spark")
    assert(canon("cable") == "table" && canon("tale") == "table")
    assert(canon("zebra") == "zebra")
    assert(got.find(_._1 == "spark").get._3 == 5L)
  }
}
