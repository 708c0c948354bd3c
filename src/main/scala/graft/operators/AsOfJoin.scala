package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed AS-OF join — for every left row, the single right row with
  * the greatest `timeCol` ≤ the left row's time within the same key group
  * (time-series point lookup: attribution, mark-to-market, sensor
  * alignment). Spark has no native as-of operator; the scalable shape is
  * the UNION + RUNNING-LAST window, not a join:
  *
  *   - both sides are tagged and unioned (right rows sort before left rows
  *     at equal time, so "≤" ties match);
  *   - one window per key group, ordered by (time, side, tiebreak), carries
  *     the last-seen right payload forward (`last(..., ignoreNulls)` over a
  *     running row frame — O(n) incremental, not O(n²));
  *   - left rows then read their match from the running state.
  *
  * ONE shuffle total (the window's partitionBy) regardless of how many
  * right rows precede each left row — a join formulation would either
  * range-explode or re-scan history per left row. Equal-(key, time) right
  * rows resolve deterministically to the greatest `tiebreak` (the analogue
  * of dedup-keep-latest), which is what makes results engine-portable.
  *
  * Scale note: a key whose full history exceeds one task's share funnels
  * into one sort task (windows cannot split a partition); at corpus scale
  * keys are entities (users, instruments) — high-cardinality by
  * construction. Range-bucketing time into epochs with boundary carryover
  * is the known refinement if a single key's history is itself huge; the
  * per-batch logic is unchanged.
  */
object AsOfJoin {

  /** Backward as-of join (most recent right row at or before each left
    * row). Output: every left column, plus every non-key non-time right
    * column (null when no right row precedes). `tiebreak` must be a right
    * column making (keys, time, tiebreak) unique.
    */
  def backward(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      timeCol: String,
      tiebreak: String): DataFrame =
    join(left, right, keys, timeCol, tiebreak, forwardDir = false)

  /** Forward as-of join (EARLIEST right row at or after each left row) —
    * the same running-last machinery over a reversed time order; equal
    * times match, equal-(key, time) right rows resolve to the greatest
    * `tiebreak`.
    */
  def forward(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      timeCol: String,
      tiebreak: String): DataFrame =
    join(left, right, keys, timeCol, tiebreak, forwardDir = true)

  /** Backward as-of join with EPOCH BUCKETING — the scale refinement for
    * single keys whose full history exceeds one task's share (the funnel
    * the plain window form documents): time is quantized into buckets of
    * `bucketWidth` (in the time column's numeric domain — microseconds for
    * timestamps), the running-match window runs per (key, bucket) — so
    * parallelism is keys × buckets — and matches that cross a bucket
    * boundary come from a carry relation: one summary row per (key,
    * bucket) (its last right row), prefix-scanned per key. The carry scan
    * is the only per-key-ordered step and runs over bucket COUNTS, not row
    * counts. Results are identical to [[backward]] by construction.
    */
  def backwardBucketed(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      timeCol: String,
      tiebreak: String,
      bucketWidth: Long): DataFrame =
    joinBucketed(left, right, keys, timeCol, tiebreak, forwardDir = false, bucketWidth)

  /** Forward as-of join with epoch bucketing — see [[backwardBucketed]]. */
  def forwardBucketed(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      timeCol: String,
      tiebreak: String,
      bucketWidth: Long): DataFrame =
    joinBucketed(left, right, keys, timeCol, tiebreak, forwardDir = true, bucketWidth)

  /** Tagged/unioned sides with the shared column contract — the prep both
    * the plain-window and bucketed forms build on. Returns (left rows,
    * right rows, left payload names, right payload names).
    */
  private def prep(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      timeCol: String,
      tiebreak: String): (DataFrame, DataFrame, Seq[String], Seq[String]) = {
    require(keys.nonEmpty, "as-of join needs at least one key column")
    val payloadCols = right.columns.filterNot(c => keys.contains(c) || c == timeCol).toSeq
    val leftCols = left.columns.filterNot(c => keys.contains(c) || c == timeCol).toSeq
    require(payloadCols.contains(tiebreak), s"tiebreak $tiebreak must be a right payload column")
    require(leftCols.intersect(payloadCols).isEmpty,
      s"left/right non-key column names must be disjoint, both have: " +
        leftCols.intersect(payloadCols).mkString(", "))
    val tbType = right.schema(tiebreak).dataType

    val lStructT = org.apache.spark.sql.types.StructType(
      leftCols.map(c => left.schema(c)))
    val rStructT = org.apache.spark.sql.types.StructType(
      payloadCols.map(c => right.schema(c)))

    val l = left.select(
      keys.map(col) ++ Seq(
        col(timeCol),
        lit(1).as("__side"),
        lit(null).cast(tbType).as("__tb"),
        struct(leftCols.map(col): _*).as("__l"),
        lit(null).cast(rStructT).as("__r")): _*)
    // a null-time right row is unmatchable under the ≤/≥ contract (null
    // compares unknown), but Spark's default asc ordering is nulls-FIRST —
    // unfiltered it would sort ahead of everything and be carried as the
    // running match for left rows with no true predecessor. Null-time LEFT
    // rows are kept and get a null match — the orders used below pin nulls
    // FIRST (and the bucketed form gives null buckets no carry), so the
    // running state is still empty when they are read.
    val r = right.filter(col(timeCol).isNotNull).select(
      keys.map(col) ++ Seq(
        col(timeCol),
        lit(0).as("__side"),
        col(tiebreak).as("__tb"),
        lit(null).cast(lStructT).as("__l"),
        struct(payloadCols.map(col): _*).as("__r")): _*)
    (l, r, leftCols, payloadCols)
  }

  private def finish(
      matched: DataFrame,
      keys: Seq[String],
      timeCol: String,
      leftCols: Seq[String],
      payloadCols: Seq[String]): DataFrame =
    matched
      .filter(col("__side") === 1)
      .select(
        keys.map(col) ++ Seq(col(timeCol)) ++
          leftCols.map(c => col("__l").getField(c).as(c)) ++
          payloadCols.map(c => col("__m").getField(c).as(c)): _*)

  private def join(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      timeCol: String,
      tiebreak: String,
      forwardDir: Boolean): DataFrame = {
    val (l, r, leftCols, payloadCols) = prep(left, right, keys, timeCol, tiebreak)
    val timeOrder =
      if (forwardDir) col(timeCol).desc_nulls_first else col(timeCol).asc_nulls_first
    val win = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(timeOrder, col("__side").asc, col("__tb").asc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    finish(
      l.unionByName(r)
        .withColumn("__m", last(col("__r"), ignoreNulls = true).over(win)),
      keys, timeCol, leftCols, payloadCols)
  }

  private def joinBucketed(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      timeCol: String,
      tiebreak: String,
      forwardDir: Boolean,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive: $bucketWidth")
    val (l, r, leftCols, payloadCols) = prep(left, right, keys, timeCol, tiebreak)

    // numeric time for bucketing (µs for timestamps); exact long-domain
    // floor division — double floor() flips buckets at epoch magnitudes
    val tnum: Column = left.schema(timeCol).dataType match {
      case org.apache.spark.sql.types.TimestampType => unix_micros(col(timeCol))
      case _                                        => col(timeCol).cast("long")
    }
    def ep(df: DataFrame): DataFrame = df.withColumn(
      "__ep",
      call_function("div", tnum - pmod(tnum, lit(bucketWidth)), lit(bucketWidth)))

    val u = ep(l).unionByName(ep(r))

    // per-(key, bucket) summary: the bucket's LAST right row under the
    // match order (latest time backward / earliest forward; greatest
    // tiebreak at equal times) — one window per (key, bucket), tiny rows
    val sumOrder =
      if (forwardDir) Seq(col(timeCol).asc, col("__tb").desc)
      else Seq(col(timeCol).desc, col("__tb").desc)
    val bucketLast = ep(r)
      .withColumn(
        "__rn",
        row_number().over(
          Window.partitionBy((keys :+ "__ep").map(col): _*).orderBy(sumOrder: _*)))
      .filter(col("__rn") === 1)
      .select((keys :+ "__ep").map(col) :+ col("__r").as("__bl"): _*)

    // carry into each (key, bucket): the running last summary over STRICTLY
    // earlier buckets (later, forward) — ordered over bucket counts per
    // key, not row counts; null-time buckets get no carry
    val allBuckets = u.filter(col("__ep").isNotNull)
      .select((keys :+ "__ep").map(col): _*).distinct()
    val carryFrame =
      if (forwardDir)
        Window.partitionBy(keys.map(col): _*).orderBy(col("__ep").asc)
          .rowsBetween(1, Window.unboundedFollowing)
      else
        Window.partitionBy(keys.map(col): _*).orderBy(col("__ep").asc)
          .rowsBetween(Window.unboundedPreceding, -1)
    val carryFn =
      if (forwardDir) first(col("__bl"), ignoreNulls = true)
      else last(col("__bl"), ignoreNulls = true)
    val carry = allBuckets
      .join(bucketLast, keys :+ "__ep", "left")
      .withColumn("__carry", carryFn.over(carryFrame))
      .select((keys :+ "__ep").map(col) :+ col("__carry"): _*)

    // in-bucket running match, then fall back to the carry
    val timeOrder =
      if (forwardDir) col(timeCol).desc_nulls_first else col(timeCol).asc_nulls_first
    val win = Window
      .partitionBy((keys :+ "__ep").map(col): _*)
      .orderBy(timeOrder, col("__side").asc, col("__tb").asc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    finish(
      u.withColumn("__w", last(col("__r"), ignoreNulls = true).over(win))
        .join(carry, keys :+ "__ep", "left")
        .withColumn("__m", coalesce(col("__w"), col("__carry"))),
      keys, timeCol, leftCols, payloadCols)
  }
}
