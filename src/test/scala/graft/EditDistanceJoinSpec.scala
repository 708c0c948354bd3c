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

  test("canonicalize scales past one partition: no global window, brute-force equal") {
    // a vocabulary big enough to span many partitions, with planted typo
    // clusters of varied sizes; verifies (a) the id-assignment path has NO
    // window operator at all (the r8 single-partition row_number is gone)
    // and (b) output equals a union-find + argmax-frequency oracle
    def lev(x: String, y: String): Int = {
      val d = Array.tabulate(x.length + 1, y.length + 1)((i, j) =>
        if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to x.length; j <- 1 to y.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (x(i - 1) == y(j - 1)) 0 else 1))
      d(x.length)(y.length)
    }
    val rnd = new scala.util.Random(42)
    val corpus = (0 until 150).flatMap { i =>
      val base = s"w${i}q${(i * 7) % 10}z${(i * 13) % 10}x"
      val typo = base.substring(0, base.length - 1) // one deletion
      Seq.fill(1 + rnd.nextInt(4))(base) ++ Seq.fill(1 + rnd.nextInt(2))(typo)
    }
    val df = corpus.toDF("w").repartition(16)
    val result = EditDistanceJoin.canonicalize(df, "w", k = 1)
    assert(!result.queryExecution.executedPlan.toString.contains("Window"),
      "canonicalize must not plan any window operator")
    val got = result.as[(String, String, Long)].collect()
      .map(r => r._1 -> r._2).toMap

    // oracle: union-find over lev<=1 pairs of the distinct vocab
    val freq = corpus.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val vocab = freq.keys.toVector.sorted
    val parent = collection.mutable.Map(vocab.map(w => w -> w): _*)
    def find(w: String): String = if (parent(w) == w) w else { val r = find(parent(w)); parent(w) = r; r }
    for (a <- vocab; b <- vocab if a < b && lev(a, b) <= 1) parent(find(a)) = find(b)
    val byRoot = vocab.groupBy(find)
    val want = byRoot.values.flatMap { members =>
      val canon = members.minBy(w => (-freq(w), w))
      members.map(_ -> canon)
    }.toMap
    assert(got == want)
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
