package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** MATCH_RECOGNIZE-lite — regex pattern matching over per-key event
  * SEQUENCES, the SQL:2016 row-pattern-recognition operator Spark lacks
  * (Flink and Trino ship it; Spark users hand-roll window chains). The
  * classic CEP shape reduced to its robust core: each event type maps to
  * one SYMBOL character, a key's events in (ts, id) order spell a
  * string, and a Java-regex over symbols finds matches — quantifiers,
  * alternation, optionality all come free (`v{2,}c?p` = "two or more
  * views, an optional click, then a purchase").
  *
  * Exactness: the symbol string is deterministic (sort_array over
  * (ts, id, sym) structs — a total order), the regex subset is
  * engine-portable (character classes + quantifiers + alternation + '?',
  * no lookaround/backrefs), and matches are counted non-overlapping
  * left-to-right — the semantics both Java and RE2 share on that subset.
  *
  * Scale shape: ONE groupBy on the key; each key's string builds inside
  * its own aggregation buffer (the sessionization contract: a key's
  * events fit a task — documents the same bound
  * [[graft.streaming.StatefulSessionizer]] carries). No window, no
  * self-join, no explode of pattern length.
  *
  * Output: (keyCol, seq, n_events, n_matches, first_match) — first_match
  * is the first matched substring ('' when none); rows for ALL keys, so
  * match-rate rollups need no re-join.
  */
object EventPattern {

  /** `symbols` maps event-type values to single-character symbols; types
    * absent from the map are DROPPED before sequencing (the
    * MATCH_RECOGNIZE "define only what you use" rule, and what keeps
    * noise types from breaking adjacency). The pattern reaches BOTH regex
    * expressions through the Column API (never an `expr` SQL literal), so
    * backslash classes like `\d` are interpreted exactly once. A finite
    * `maxEventsPerKey` arms the [[HotKeyGuard]]: a celebrity key fails
    * the job with this contract's name instead of an executor OOM.
    */
  def matchPattern(
      events: DataFrame,
      keyCol: String,
      tsCol: String,
      idCol: String,
      typeCol: String,
      symbols: Map[String, String],
      pattern: String,
      maxEventsPerKey: Long = Long.MaxValue): DataFrame = {
    require(symbols.nonEmpty, "at least one symbol mapping")
    require(
      symbols.values.forall(_.length == 1),
      s"symbols must be single characters: $symbols")
    require(
      symbols.values.toSet.size == symbols.size,
      s"symbol characters must be distinct: $symbols")
    val symCol = symbols.foldLeft(lit(null).cast("string")) {
      case (acc, (ty, sym)) => when(col(typeCol) === ty, lit(sym)).otherwise(acc)
    }
    val base = events
      .select(
        col(keyCol),
        col(tsCol).cast("long").as("__ts"),
        col(idCol).cast("long").as("__id"),
        symCol.as("__sym"))
      .filter(col("__sym").isNotNull)
    HotKeyGuard(base, col(keyCol), maxEventsPerKey, "EventPattern.matchPattern")
      .groupBy(col(keyCol))
      .agg(sort_array(collect_list(struct(col("__ts"), col("__id"), col("__sym"))))
        .as("__evs"))
      .select(
        col(keyCol),
        concat_ws("", expr("transform(__evs, e -> e.__sym)")).as("seq"),
        size(col("__evs")).cast("long").as("n_events"))
      .withColumn(
        "n_matches",
        size(regexp_extract_all(col("seq"), lit(pattern), lit(0))).cast("long"))
      .withColumn(
        "first_match",
        when(col("n_matches") > 0, regexp_extract(col("seq"), pattern, 0))
          .otherwise(lit("")))
  }
}
