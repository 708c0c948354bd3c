package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exponentially time-decayed frequency — "what is hot NOW", the ranking a
  * crawl scheduler, trending-topics feed, or cache-admission policy reads,
  * where yesterday's burst must outrank last month's steady drip. Classic
  * formulations (Cormode et al. 2009's forward decay; Datar et al. 2002's
  * sliding-window synopses) decay with floating-point e^{−λ·age}, whose
  * sum depends on accumulation order — unusable under the exact-hash
  * oracle contract. This operator decays in EXACT INTEGERS instead:
  *
  *   - time slices into generations of `genSecs` (the decay resolution);
  *   - an event `a` generations older than `asOfSec` weighs 2^(horizon−a)
  *     — a per-generation half-life;
  *   - events older than `horizon` generations (and events after
  *     `asOfSec`) weigh 0: their weight would round below 1, the smallest
  *     representable contribution — the integer analogue of decay
  *     underflow, and what makes the score a bounded long
  *     (≤ n_window · 2^horizon, exact for horizon ≤ 62 − log₂ n).
  *
  * score(key) = Σ_events 2^(horizon − age) is a plain sum, so the whole
  * operator is ONE map-side-combinable aggregation — no per-generation
  * intermediate, no window, no state; at 100 TB it is a scan plus a
  * key-partitioned exchange of partial sums. The half-life is exact, not
  * approximate: a burst must be TWICE as large per generation older to
  * tie (in particular one current-generation event outweighs any
  * one-event-per-generation history: Σ_{a≥1} 2^(h−a) = 2^h − 1 < 2^h) —
  * the property the [[decayedTopK]] ranking inherits.
  */
object Decay {

  /** Weight of a generation-id column as of `asOfGen`: 2^(horizon − age)
    * inside the window, 0 outside (older than horizon, or future). The
    * ONE source of decay math — shared by the event-grain batch operator
    * and the census-grain streaming consumer
    * ([[graft.streaming.StreamingDecay]]).
    */
  def generationWeight(
      genCol: org.apache.spark.sql.Column,
      asOfGen: Long,
      horizon: Int): org.apache.spark.sql.Column = {
    val age = (lit(asOfGen) - genCol).cast("int")
    when(
      age >= 0 && age <= horizon,
      call_function("shiftleft", lit(1L), lit(horizon) - age))
      .otherwise(lit(0L))
  }

  /** Per-key decayed score: (keyCols…, n_window, decayed) over events
    * inside the `horizon`-generation window ending at `asOfSec`.
    * `tsSecCol` is epoch SECONDS (a long column). Keys with no in-window
    * events are absent (their score is exactly 0). The as-of cutoff is
    * EVENT-exact here: events with ts > asOfSec are filtered out even
    * inside the as-of generation (the streaming consumer
    * [[graft.streaming.StreamingDecay]] keeps generation-grain state, so
    * its cutoff is generation-granular by construction — equal to this
    * operator whenever asOfSec is the newest event seen, the arrival-order
    * contract it runs under).
    */
  def decayedCounts(
      df: DataFrame,
      keyCols: Seq[String],
      tsSecCol: String,
      asOfSec: Long,
      genSecs: Long,
      horizon: Int): DataFrame = {
    require(keyCols.nonEmpty, "decayedCounts needs at least one key column")
    require(genSecs > 0, s"genSecs must be positive, got $genSecs")
    require(horizon >= 0 && horizon <= 50, s"horizon out of [0,50]: $horizon")
    require(asOfSec >= 0, s"asOfSec must be non-negative, got $asOfSec")
    val asOfGen = asOfSec / genSecs
    val w = generationWeight(expr(s"$tsSecCol div ${genSecs}L"), asOfGen, horizon)
    df.filter(col(tsSecCol).isNotNull && col(tsSecCol) <= asOfSec)
      .select((keyCols.map(col) :+ w.as("__w")): _*)
      .filter(col("__w") > 0L)
      .groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n_window"), sum("__w").as("decayed"))
  }

  /** Window-free rank over an already-`orderBy(…).limit(k)` relation
    * carrying (keyCols…, n_window, decayed): rank = 1 + #{strictly
    * better rows} by (decayed desc, keyCols asc), via a broadcast
    * self-join over the ≤ k survivors. The single-partition
    * `Window.orderBy` this replaces was bounded too, but fired Spark's
    * "No Partition Defined" warning on every run — this form has no
    * window at all (round-11 hygiene item; shared with
    * [[graft.streaming.StreamingDecay]]).
    */
  private[graft] def rankLimited(top: DataFrame, keyCols: Seq[String]): DataFrame = {
    val rhs = broadcast(top.select(top.columns.map(c => col(c).as(s"__r_$c")): _*))
    val keyLex = keyCols.foldRight(lit(false)) { (kc, rest) =>
      col(s"__r_$kc") < col(kc) || (col(s"__r_$kc") === col(kc) && rest)
    }
    val better = col("__r_decayed") > col("decayed") ||
      (col("__r_decayed") === col("decayed") && keyLex)
    top.join(rhs, better, "left")
      .groupBy(top.columns.map(col): _*)
      .agg((count(col("__r_decayed")) + 1).cast("int").as("rank"))
  }

  /** The k hottest keys by decayed score, rank tiebroken on the key
    * columns so the result is set-deterministic. The scored relation is
    * key-cardinality-sized and the global head plans as
    * TakeOrderedAndProject (per-partition heads, never a full sort); the
    * rank comes from [[rankLimited]]'s broadcast self-join over the k
    * survivors — bounded at any scale, and window-free.
    * Output: (keyCols…, n_window, decayed, rank).
    */
  def decayedTopK(
      df: DataFrame,
      keyCols: Seq[String],
      tsSecCol: String,
      asOfSec: Long,
      genSecs: Long,
      horizon: Int,
      k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val order = col("decayed").desc +: keyCols.map(col(_).asc)
    rankLimited(
      decayedCounts(df, keyCols, tsSecCol, asOfSec, genSecs, horizon)
        .orderBy(order: _*)
        .limit(k),
      keyCols)
  }
}
