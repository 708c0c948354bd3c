package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.operators.SubsequenceMatch

/** Subsequence-matching query pack (S3M/KV-match capability) over the
  * events table. The stored series is the global event sequence —
  * `event_id` is dense 0..n−1, so index assignment and the delta transform
  * are equi-joins (`v(i) = value(i+1) − value(i)`), never a global-order
  * window. The query sequence is the series' own window [500, 600) — its
  * matches (including the exact self-match at 500) are well-separated in
  * distance, so thresholds sit in wide gaps.
  */
object SeqMatchQueries {

  /** Delta series (idx, v), idx ∈ [0, n−2]: SURVEY M1 as an equi-join. */
  def deltaSeries(events: DataFrame): DataFrame = {
    val a = events.select(col("event_id").as("idx"), col("value"))
    val b = events.select((col("event_id") - 1).as("idx"), col("value").as("nv"))
    a.join(b, "idx").select(col("idx"), (col("nv") - col("value")).as("v"))
  }

  /** Shared per-(session, dir) series + mean index: the reference builds
    * its KV index ONCE (`IndexBuilder` persists it to storage) and every
    * query engine reads that artifact — rebuilding the index per query
    * would be both unfaithful and wasteful. Both DataFrames are persisted;
    * q28/q29/q30/q42 all read through here.
    */
  private val indexCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), (DataFrame, DataFrame)]

  private def seriesAndIndex(s: SparkSession, dir: String): (DataFrame, DataFrame) =
    indexCache.getOrElseUpdate((s, dir), {
      // only the INDEX is persisted: caching the series too turns the
      // verify gather's position join against an InMemoryRelation whose
      // size estimate blocks the broadcast plan (measured 6× slower on the
      // DTW queries); the series stays a lazy equi-join over the parquet
      // scan, exactly what phase 2 wants to probe
      val series = deltaSeries(Tables(s, dir, "events"))
      val index = SubsequenceMatch.meanIndex(series).persist()
      index.count()
      (series, index)
    })

  private def queryWindow(series: DataFrame, from: Long, len: Int): Array[Double] = {
    val rows = series
      .filter(col("idx") >= from && col("idx") < from + len)
      .orderBy("idx")
      .select("v")
      .collect()
    require(rows.length == len, s"query window [$from,${from + len}) incomplete")
    rows.map(_.getDouble(0))
  }

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Exact ED subsequence match (SURVEY M2/M3): multi-width mean index →
    // segment mean probe → exact verify. Oracle = brute-force sliding ED.
    "q28_seqmatch_ed" -> ((s, dir) => {
      val (series, index) = seriesAndIndex(s, dir)
      val q = queryWindow(series, 500, 100)
      SubsequenceMatch.matchED(series, index, q, math.sqrt(430000.0))
        .select(col("start"), round(col("d2"), 2).as("d2"))
        .orderBy("start")
    }),

    // Banded DTW match (SURVEY M4): band-widened probe + exact DP verify.
    // DTW's DP has no SQL form → rows-only check; SubsequenceMatchSpec
    // compares against a naive full-scan DTW.
    "q29_seqmatch_dtw" -> ((s, dir) => {
      val (series, index) = seriesAndIndex(s, dir)
      val q = queryWindow(series, 500, 100)
      SubsequenceMatch.matchDTW(series, index, q, math.sqrt(25000.0), band = 5)
        .select(col("start"), round(col("d2"), 2).as("d2"))
        .orderBy("start")
    }),

    // Z-normalized ED with the reference's amplitude constraints (SURVEY
    // M5): oracle is the closed form 2m − 2·⟨s,zq⟩/σ_s over the
    // brute-force sliding window.
    "q30_seqmatch_normed" -> ((s, dir) => {
      val (series, index) = seriesAndIndex(s, dir)
      val q = queryWindow(series, 500, 100)
      SubsequenceMatch.matchNormED(
          series, index, q, eps = math.sqrt(117.0), alphaStd = 3.0, betaMean = 5.0)
        // clamp: the closed form can land at −1e-13 on the self-match and
        // round to an engine-dependent −0.0
        .select(col("start"), round(greatest(col("d2"), lit(0.0)), 2).as("d2"))
        .orderBy("start")
    }),

    // Z-normalized banded DTW (SURVEY M5/M6 — the reference's 4th query
    // mode): DTW's DP has no SQL form → rows-only; SubsequenceMatchSpec
    // compares against a naive full-scan normalized DTW.
    "q42_seqmatch_normdtw" -> ((s, dir) => {
      val (series, index) = seriesAndIndex(s, dir)
      val q = queryWindow(series, 500, 100)
      SubsequenceMatch.matchNormDTW(
          series, index, q, eps = math.sqrt(20.0), rho = 5, alphaStd = 3.0, betaMean = 5.0)
        .select(col("start"), round(col("d2"), 2).as("d2"))
        .orderBy("start")
    }))

  val oracles: Map[String, String] = Map(
    // normED closed form: d2 = 2m − 2·⟨s, zq⟩/σ_s with the amplitude
    // filters — same cross-join-and-group shape as q28's oracle.
    "q30_seqmatch_normed" ->
      """WITH d AS (
        |  SELECT a.event_id AS idx, b.value - a.value AS v
        |  FROM events a JOIN events b ON b.event_id = a.event_id + 1),
        |q AS (SELECT idx - 500 AS qi, v AS qv FROM d WHERE idx >= 500 AND idx < 600),
        |qs AS (SELECT avg(qv) AS muq,
        |              sqrt(avg(pow(qv, 2)) - pow(avg(qv), 2)) AS sdq FROM q),
        |zq AS (SELECT qi, (qv - muq) / sdq AS zqv FROM q, qs),
        |w AS (
        |  SELECT s.idx - z.qi AS start,
        |         count(*) AS c,
        |         avg(s.v) AS mu,
        |         sqrt(avg(pow(s.v, 2)) - pow(avg(s.v), 2)) AS sd,
        |         sum(s.v * z.zqv) AS dot
        |  FROM d s JOIN zq z ON true
        |  GROUP BY 1)
        |SELECT start, round(greatest(200 - 2 * dot / sd, 0), 2) AS d2
        |FROM w, qs
        |WHERE c = 100 AND sd > 0
        |  AND abs(mu - muq) <= 5.0
        |  AND sd / sdq <= 3.0 AND sd / sdq >= 1.0 / 3.0
        |  AND 200 - 2 * dot / sd <= 117.0
        |ORDER BY start""".stripMargin,

    "q28_seqmatch_ed" ->
      """WITH d AS (
        |  SELECT a.event_id AS idx, b.value - a.value AS v
        |  FROM events a JOIN events b ON b.event_id = a.event_id + 1),
        |q AS (SELECT idx - 500 AS qi, v AS qv FROM d WHERE idx >= 500 AND idx < 600)
        |SELECT s.idx - q.qi AS start, round(sum(pow(s.v - q.qv, 2)), 2) AS d2
        |FROM d s JOIN q ON true
        |GROUP BY 1
        |HAVING count(*) = 100 AND sum(pow(s.v - q.qv, 2)) <= 430000
        |ORDER BY 1""".stripMargin)
}
