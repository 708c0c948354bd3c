package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (type 2) history from a change log: turn a
  * stream of (key, ts, attrs…) change records into one validity interval
  * per effective change — the dimension-history table a warehouse keeps
  * so facts can join "the attributes as they were at event time" (via
  * [[RangeJoin]]/[[AsOfJoin]] on the interval).
  *
  * Semantics: changes order per key by (ts, tiebreak) — a total order, so
  * the history is execution-order-independent; consecutive records whose
  * tracked attributes are UNCHANGED are compressed away (no-op updates
  * produce no interval); each surviving change is valid from its ts until
  * the next surviving change's ts (−1 = open/current). The unchanged test
  * is NULL-SAFE (`<=>`): NULL is a value — NULL→NULL compresses, NULL→x
  * and x→NULL open new intervals (a three-valued `<>` would silently drop
  * any change touching a NULL attribute; the oracle pins the null-safe
  * reading via IS DISTINCT FROM).
  *
  * Scale shape: two windows over the same (key × time) partitioning — one
  * lag for compression, one lead for interval close — planned as a single
  * sort per key partition; keys hash-partition evenly, and no driver
  * state. Exact µs integer arithmetic throughout.
  */
object Scd {

  /** BITEMPORAL reconstruction — the dimension history "as the warehouse
    * KNEW it at transaction time T": filter the change log to records
    * whose transaction (ingest/commit) timestamp is ≤ T, then build the
    * valid-time history from what remains. Late-arriving corrections
    * (tx ≫ valid ts) are invisible before their tx time and splice in
    * after — so `asKnownAt(log, t1)` vs `asKnownAt(log, t2)` answers the
    * audit question "what did this report say last Tuesday, and why did
    * it change?". The two time axes never mix: valid time orders
    * intervals inside [[type2History]]; transaction time only gates
    * VISIBILITY. Same scale shape as type2History (the tx filter is
    * scan-level, pushed to the log's storage).
    */
  def asKnownAt(
      changes: DataFrame,
      keyCol: String,
      tsUsCol: String,
      txUsCol: String,
      tiebreakCol: String,
      attrCols: Seq[String],
      asOfTxUs: Long): DataFrame =
    type2History(
      changes.filter(col(txUsCol).cast("long") <= asOfTxUs),
      keyCol, tsUsCol, tiebreakCol, attrCols)

  /** History rows: (keyCol, attrCols…, valid_from, valid_to, is_current). */
  def type2History(
      changes: DataFrame,
      keyCol: String,
      tsUsCol: String,
      tiebreakCol: String,
      attrCols: Seq[String]): DataFrame = {
    require(attrCols.nonEmpty, "type2History needs at least one tracked attribute")
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsUsCol), col(tiebreakCol))
    val attrs = struct(attrCols.map(col): _*)
    // one explicit null-safe predicate: a first row's lag is a NULL
    // struct (struct() itself is never NULL), so `not <=>` both keeps
    // the first row and compares attribute structs nulls-as-values
    val compressed = changes
      .withColumn("__prev", lag(attrs, 1).over(w))
      .filter(!(col("__prev") <=> attrs))
    val w2 = Window.partitionBy(col(keyCol)).orderBy(col(tsUsCol), col(tiebreakCol))
    compressed
      .withColumn("valid_from", col(tsUsCol))
      .withColumn("valid_to", coalesce(lead(col(tsUsCol), 1).over(w2), lit(-1L)))
      .withColumn("is_current", col("valid_to") === -1L)
      .select((Seq(keyCol) ++ attrCols ++ Seq("valid_from", "valid_to", "is_current"))
        .map(col): _*)
  }
}
