package graft

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.operators.SubsequenceMatch
import graft.queries.SeqMatchQueries

/** SubsequenceMatch vs driver-side naive full scans on the sf0.001 events
  * series (~1000 points — collectable).
  */
class SubsequenceMatchSpec extends SparkSpec {
  init()

  private lazy val series = SeqMatchQueries.deltaSeries(Tables(spark, sfSmoke, "events"))
  private lazy val vals: Array[Double] = series.orderBy("idx").select("v")
    .collect().map(_.getDouble(0))
  private lazy val index = SubsequenceMatch.meanIndex(series).persist()
  private val m = 50
  private lazy val q: Array[Double] = vals.slice(200, 200 + m)

  private def naiveEd2(o: Int): Double = {
    var s = 0.0
    var i = 0
    while (i < m) { val d = vals(o + i) - q(i); s += d * d; i += 1 }
    s
  }

  private def naiveDtw2(o: Int, band: Int): Double = {
    val s = vals.slice(o, o + m)
    val INF = Double.MaxValue / 4
    val prev = Array.fill(m + 1)(INF)
    val curr = Array.fill(m + 1)(INF)
    prev(0) = 0.0
    for (i <- 1 to m) {
      java.util.Arrays.fill(curr, INF)
      for (j <- math.max(1, i - band) to math.min(m, i + band)) {
        val c = (q(i - 1) - s(j - 1)) * (q(i - 1) - s(j - 1))
        curr(j) = c + math.min(prev(j), math.min(prev(j - 1), curr(j - 1)))
      }
      System.arraycopy(curr, 0, prev, 0, m + 1)
    }
    prev(m)
  }

  test("prefix-sum mean index equals exact window means") {
    val idx50 = index.filter(col("w") === 50).orderBy("offset")
      .select("offset", "mean").collect()
    assert(idx50.length == vals.length - 50 + 1)
    idx50.take(200).foreach { r =>
      val o = r.getLong(0).toInt
      val exact = vals.slice(o, o + 50).sum / 50
      assert(math.abs(r.getDouble(1) - exact) < 1e-9, s"offset $o")
    }
  }

  test("recursive prefix sums are exact when blocks outnumber the block size") {
    import spark.implicits._
    // 20 000 rows at blockSize 64 → 313 blocks → a second recursion level
    // (313 > 64): every window in the tree sees ≤ 64 rows
    val n = 20000
    val xs = (0 until n).map(i => (i.toLong, math.sin(i * 0.37) + i % 7))
    val got = SubsequenceMatch
      .withPrefixSum(xs.toDF("idx", "v"), blockSize = 64)
      .orderBy("idx").select("prefix").as[Double].collect()
    var acc = 0.0
    xs.zipWithIndex.foreach { case ((_, v), i) =>
      acc += v
      assert(math.abs(got(i) - acc) < 1e-6 * math.max(1.0, math.abs(acc)), s"idx $i")
    }
    // sparse, non-dense keys keep ordered semantics (blocks bucket by value)
    val sparse = Seq((3L, 1.0), (4000L, 2.0), (4001L, 3.0), (900000L, 4.0))
    val sp = SubsequenceMatch.withPrefixSum(sparse.toDF("idx", "v"), blockSize = 2)
      .orderBy("idx").select("prefix").as[Double].collect().toSeq
    assert(sp == Seq(1.0, 3.0, 6.0, 10.0))
  }

  test("matchED equals the naive full-scan result") {
    val distances = (0 to vals.length - m).map(naiveEd2)
    // pick an eps covering ~8 offsets, in the middle of a wide gap
    val sorted = distances.sorted
    val eps2 = (sorted(7) + sorted(8)) / 2
    val expected = (0 to vals.length - m).filter(o => naiveEd2(o) <= eps2).toSet
    val got = SubsequenceMatch.matchED(series, index, q, math.sqrt(eps2))
      .select("start").collect().map(_.getLong(0).toInt).toSet
    assert(got == expected, s"got=$got expected=$expected")
  }

  test("matchED phase-1 prunes at tight eps") {
    val starts = SubsequenceMatch.candidateStarts(
      index, q, eps = 2.0, SubsequenceMatch.DefaultWidths, band = 0)
    val n = vals.length - m + 1
    val c = starts.count()
    assert(c < n / 2, s"mean probe barely prunes: $c of $n")
    // and the surviving set still contains the self-match
    assert(starts.filter(col("start") === 200).count() == 1)
  }

  test("matchDTW equals the naive banded DTW full scan") {
    val band = 3
    val distances = (0 to vals.length - m).map(o => naiveDtw2(o, band))
    val sorted = distances.sorted
    val eps2 = (sorted(5) + sorted(6)) / 2
    val expected = (0 to vals.length - m).filter(o => naiveDtw2(o, band) <= eps2).toSet
    val got = SubsequenceMatch.matchDTW(series, index, q, math.sqrt(eps2), band)
      .select("start").collect().map(_.getLong(0).toInt).toSet
    assert(got == expected, s"got=$got expected=$expected")
  }

  private lazy val muQ = q.sum / m
  private lazy val sdQ = math.sqrt(q.map(x => x * x).sum / m - muQ * muQ)
  private lazy val qn = q.map(x => (x - muQ) / sdQ)

  /** (mu, sd, z-normalized window) if the amplitude constraints hold. */
  private def normWindow(o: Int, alpha: Double, beta: Double): Option[Array[Double]] = {
    val s = vals.slice(o, o + m)
    val mu = s.sum / m
    val sd = math.sqrt(s.map(x => x * x).sum / m - mu * mu)
    if (sd <= 0 || math.abs(mu - muQ) > beta ||
      sd / sdQ > alpha || sd / sdQ < 1.0 / alpha) None
    else Some(s.map(x => (x - mu) / sd))
  }

  test("matchNormED equals the naive z-normalized scan under the amplitude constraints") {
    val alpha = 3.0
    val beta = 5.0
    def naiveNorm(o: Int): Option[Double] =
      normWindow(o, alpha, beta).map(_.zip(qn).map { case (x, z) =>
        val d = x - z; d * d
      }.sum)
    val all = (0 to vals.length - m).flatMap(o => naiveNorm(o).map(o -> _))
    val sorted = all.map(_._2).sorted
    val eps2 = (sorted(5) + sorted(6)) / 2
    val expected = all.filter(_._2 <= eps2).map(_._1).toSet
    val got = SubsequenceMatch.matchNormED(series, index, q, math.sqrt(eps2), alpha, beta)
      .select("start").collect().map(_.getLong(0).toInt).toSet
    assert(got == expected, s"got=$got expected=$expected")
  }

  test("matchNormDTW equals the naive z-normalized banded DTW scan") {
    val alpha = 3.0
    val beta = 5.0
    val rho = 3
    def naiveNormDtw(o: Int): Option[Double] =
      normWindow(o, alpha, beta).map { zs =>
        val INF = Double.MaxValue / 4
        val prev = Array.fill(m + 1)(INF)
        val curr = Array.fill(m + 1)(INF)
        prev(0) = 0.0
        for (i <- 1 to m) {
          java.util.Arrays.fill(curr, INF)
          for (j <- math.max(1, i - rho) to math.min(m, i + rho)) {
            val c = (qn(i - 1) - zs(j - 1)) * (qn(i - 1) - zs(j - 1))
            curr(j) = c + math.min(prev(j), math.min(prev(j - 1), curr(j - 1)))
          }
          System.arraycopy(curr, 0, prev, 0, m + 1)
        }
        prev(m)
      }
    val all = (0 to vals.length - m).flatMap(o => naiveNormDtw(o).map(o -> _))
    val sorted = all.map(_._2).sorted
    val eps2 = (sorted(5) + sorted(6)) / 2
    val expected = all.filter(_._2 <= eps2).map(_._1).toSet
    val got = SubsequenceMatch
      .matchNormDTW(series, index, q, math.sqrt(eps2), rho, alpha, beta)
      .select("start").collect().map(_.getLong(0).toInt).toSet
    assert(got == expected, s"got=$got expected=$expected")
  }

  test("segments greedily cover with the largest widths") {
    assert(SubsequenceMatch.segments(100, Seq(25, 50, 100)) == Seq((0, 100)))
    assert(SubsequenceMatch.segments(130, Seq(25, 50, 100)) == Seq((0, 100), (100, 25)))
    assert(SubsequenceMatch.segments(60, Seq(25, 50, 100)) == Seq((0, 50)))
    assert(SubsequenceMatch.segments(10, Seq(25, 50)).isEmpty)
  }

  // ---- phase-1 refinements (reference ENABLE_QUERY_REORDERING /
  // ENABLE_EARLY_TERMINATION / ENABLE_INCREMENTAL_VISITING) ----

  private val mLong = 150 // covers as (0,100) + (100,50): a real multi-segment plan
  private lazy val qLong: Array[Double] = vals.slice(100, 100 + mLong)

  test("adaptive phase 1 returns the exact same matches as the exhaustive plan") {
    val distances = (0 to vals.length - mLong).map { o =>
      var s = 0.0; var i = 0
      while (i < mLong) { val d = vals(o + i) - qLong(i); s += d * d; i += 1 }
      s
    }
    val eps = math.sqrt(distances.sorted.apply(6) + 1e-9)
    val exhaustive = SubsequenceMatch.matchED(series, index, qLong, eps)
      .select("start").collect().map(_.getLong(0)).toSet
    val adaptiveGot = SubsequenceMatch.matchED(series, index, qLong, eps, adaptive = true)
      .select("start").collect().map(_.getLong(0)).toSet
    assert(adaptiveGot == exhaustive)
    assert(adaptiveGot.nonEmpty)
  }

  test("cost model stops probing when verify beats another index scan") {
    // huge costRatio: phase 2 always judged cheaper → exactly one probe
    val (cand1, probed1) = SubsequenceMatch.candidateStartsPlanned(
      index, qLong, eps = 5.0, SubsequenceMatch.DefaultWidths, band = 0,
      adaptive = true, costRatio = 1e9)
    assert(probed1 == 1)
    // zero costRatio: never stops → every segment probed
    val (cand2, probed2) = SubsequenceMatch.candidateStartsPlanned(
      index, qLong, eps = 5.0, SubsequenceMatch.DefaultWidths, band = 0,
      adaptive = true, costRatio = 0.0)
    assert(probed2 == SubsequenceMatch.segments(mLong, SubsequenceMatch.DefaultWidths).size)
    // one-probe candidates are a superset of the full intersection
    assert(cand2.join(cand1, Seq("start"), "left_anti").isEmpty)
  }

  test("incremental index cache serves repeated queries without re-scanning") {
    val cache = new graft.operators.MeanIndexCache(index, bucketWidth = 0.25)
    val eps = 3.0
    val first = SubsequenceMatch.matchED(series, index, qLong, eps, cache = Some(cache))
      .select("start").collect().map(_.getLong(0)).toSet
    val missesAfterFirst = cache.bucketMisses
    assert(missesAfterFirst > 0)
    // identical repeated query: served entirely from cached bucket slices
    val second = SubsequenceMatch.matchED(series, index, qLong, eps, cache = Some(cache))
      .select("start").collect().map(_.getLong(0)).toSet
    assert(cache.bucketMisses == missesAfterFirst)
    assert(second == first)
    // uncached run agrees
    val uncached = SubsequenceMatch.matchED(series, index, qLong, eps)
      .select("start").collect().map(_.getLong(0)).toSet
    assert(uncached == first)
    cache.close()
  }

  test("index cache is bounded: LRU eviction caps persisted slices, results stay exact") {
    val cap = 4
    val cache = new graft.operators.MeanIndexCache(index, bucketWidth = 0.25, maxSlices = cap)
    def exact(w: Int, lo: Double, hi: Double) =
      index.filter(col("w") === w && col("mean").between(lo, hi))
        .select("offset").collect().map(_.getLong(0)).toSet
    def probe(w: Int, lo: Double, hi: Double) =
      cache.probe(w, lo, hi).select("offset").collect().map(_.getLong(0)).toSet

    // sweep far more than `cap` distinct buckets across two widths
    val w = SubsequenceMatch.DefaultWidths.head
    val ranges = (0 until 12).map(i => (i * 0.5, i * 0.5 + 0.4))
    ranges.foreach { case (lo, hi) =>
      assert(probe(w, lo, hi) == exact(w, lo, hi), s"mismatch at [$lo,$hi]")
      assert(cache.cachedBuckets <= cap,
        s"cap violated: ${cache.cachedBuckets} slices live")
    }
    assert(cache.bucketEvictions > 0, "sweep never evicted — cap untested")
    // a re-probed evicted bucket is a fresh miss, and still exact
    val missesBefore = cache.bucketMisses
    assert(probe(w, ranges.head._1, ranges.head._2) == exact(w, ranges.head._1, ranges.head._2))
    assert(cache.bucketMisses > missesBefore)
    cache.close()
    assert(cache.cachedBuckets == 0)
  }

  test("sliding phase 2 equals gather phase 2; dots exact across blocks and gaps") {
    import spark.implicits._
    // gapped series: idx 300..309 removed — windows covering the gap must
    // vanish from BOTH paths; block=64 forces boundary-straddling windows
    val gapped = series.filter(col("idx") < 300 || col("idx") >= 310)
    val dots = SubsequenceMatch.slidingDots(gapped, q, block = 128)
      .select("start", "dot")
      .as[(Long, Double)].collect().toMap
    val gvals = gapped.orderBy("idx").select("idx", "v")
      .as[(Long, Double)].collect()
    val byIdx = gvals.toMap
    val n = vals.length
    (0L until (n - m + 1).toLong).foreach { st =>
      val window = (st until st + m).map(byIdx.get)
      if (window.forall(_.isDefined)) {
        val exact = window.flatten.zip(q).map { case (v, qv) => v * qv }.sum
        assert(math.abs(dots(st) - exact) < 1e-9, s"start $st")
      } else assert(!dots.contains(st), s"gap window $st must not emit")
    }

    // full operators: forced-sliding == forced-gather (ED and normED)
    def sets(df: org.apache.spark.sql.DataFrame) = df
      .select(col("start"), round(col("d2"), 6).as("d2"))
      .as[(Long, Double)].collect().toSet
    val eps = 3.0
    assert(
      sets(SubsequenceMatch.matchED(series, index, q, eps, phase2 = "sliding")) ==
        sets(SubsequenceMatch.matchED(series, index, q, eps, phase2 = "gather")))
    assert(
      sets(SubsequenceMatch.matchNormED(
        series, index, q, 1.5, 3.0, 10.0, phase2 = "sliding")) ==
        sets(SubsequenceMatch.matchNormED(
          series, index, q, 1.5, 3.0, 10.0, phase2 = "gather")))
  }
}
