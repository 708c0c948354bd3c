package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality constraint validation — the Deequ idea
  * (Schelter et al., VLDB 2018: "Automating large-scale data quality
  * verification") re-expressed as plan composition: a suite of N checks
  * compiles into the MINIMAL number of passes over the data, not N.
  *
  * - All SCAN-level checks (completeness, range, set membership, regex
  *   conformance, row count) fold into ONE aggregation over ONE scan —
  *   adding a check adds a column to the agg, never a pass; the single
  *   agg row is then melted (`stack`) and joined to a broadcast
  *   check-spec relation, so the whole tier is one map-side-combined
  *   reduce to one row, no shuffle of data rows at all.
  * - DISTINCT-grain checks (uniqueness) each need their own key
  *   exchange by nature; they run as grouped sub-aggregations unioned
  *   in (count-distinct via groupBy, never Expand-multiplied rows).
  * - REFERENTIAL checks (foreign key ⊆ reference) are anti-join counts
  *   — broadcast when the reference is small, shuffle otherwise (AQE
  *   decides; the check never collects).
  *
  * Every metric is an exact integer in basis points (`10000·x div n`),
  * so verdicts replay bit-for-bit in any engine. Output one row per
  * check: (check, target, metric_bp, threshold_bp, pass) — for
  * row_count and foreign_key, metric_bp carries the raw count
  * (rows / violations) rather than a ratio.
  */
object Constraints {

  sealed trait Check
  /** non-null ratio of `col` ≥ minBp */
  final case class Complete(col: String, minBp: Long) extends Check
  /** ratio of rows with `lo ≤ col ≤ hi` ≥ minBp (NULL fails the predicate) */
  final case class InRange(col: String, lo: Long, hi: Long, minBp: Long) extends Check
  /** ratio of rows whose `col` is in `values` ≥ minBp */
  final case class InSet(col: String, values: Seq[String], minBp: Long) extends Check
  /** ratio of non-null rows matching `re` ≥ minBp over ALL rows
    * (engine-portable regex subset: character classes, anchors,
    * quantifiers — no lookaround) */
  final case class MatchesRegex(col: String, re: String, minBp: Long) extends Check
  /** row count in [lo, hi] (metric_bp carries the count, threshold lo) */
  final case class RowCount(lo: Long, hi: Long) extends Check
  /** distinct(col)/rows ≥ minBp (10000 = fully unique; NULL is a value) */
  final case class Unique(col: String, minBp: Long = 10000L) extends Check
  /** every non-null `col` value appears in `ref`'s `refCol` */
  final case class ForeignKey(col: String, ref: DataFrame, refCol: String) extends Check

  /** Validate a suite of checks; one row per check:
    * (check, target, metric_bp, threshold_bp, pass). Scan-level checks
    * share a single aggregation over a single scan of `df`.
    */
  def validate(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "validate needs at least one check")
    val spark = df.sparkSession
    import spark.implicits._

    val scanChecks: Seq[(Check, Int)] = checks.zipWithIndex.filter {
      case (_: Unique, _) | (_: ForeignKey, _) => false
      case _                                   => true
    }

    val scanRow: Option[DataFrame] =
      if (scanChecks.isEmpty) None
      else {
        val aggs: Seq[Column] = count(lit(1)).as("__n") +: scanChecks.map {
          case (Complete(c, _), i) =>
            count(col(c)).as(s"__m$i")
          case (InRange(c, lo, hi, _), i) =>
            sum(when(col(c).isNotNull && col(c) >= lo && col(c) <= hi, 1L)
              .otherwise(0L)).as(s"__m$i")
          case (InSet(c, vs, _), i) =>
            sum(when(col(c).isInCollection(vs), 1L).otherwise(0L)).as(s"__m$i")
          case (MatchesRegex(c, re, _), i) =>
            sum(when(col(c).isNotNull && col(c).rlike(re), 1L).otherwise(0L))
              .as(s"__m$i")
          case (RowCount(_, _), i) =>
            count(lit(1)).as(s"__m$i")
          case (other, i) =>
            throw new IllegalStateException(s"non-scan check in scan tier: $other at $i")
        }
        val agg = df.agg(aggs.head, aggs.tail: _*)
        val melted = agg.select(
          col("__n"),
          expr(s"stack(${scanChecks.size}, " +
            scanChecks.map { case (_, i) => s"$i, __m$i" }.mkString(", ") +
            ") AS (__i, __m)"))
        val spec = scanChecks.map {
          case (Complete(c, minBp), i) =>
            (i, "complete", c, minBp, false, 0L, 0L)
          case (InRange(c, lo, hi, minBp), i) =>
            (i, "in_range", s"$c[$lo,$hi]", minBp, false, 0L, 0L)
          case (InSet(c, vs, minBp), i) =>
            (i, "in_set", s"$c{${vs.mkString("|")}}", minBp, false, 0L, 0L)
          case (MatchesRegex(c, re, minBp), i) =>
            (i, "regex", s"$c~$re", minBp, false, 0L, 0L)
          case (RowCount(lo, hi), i) =>
            (i, "row_count", s"[$lo,$hi]", lo, true, lo, hi)
          case (other, i) =>
            throw new IllegalStateException(s"unreachable: $other at $i")
        }.toDF("__i", "check", "target", "threshold_bp", "__isCount", "__lo", "__hi")
        // greatest(__n, 1): an EMPTY relation yields ratio 0 (failing any
        // min-rate threshold > 0 — the alarm wanted on a 0-row batch)
        // instead of an ANSI divide-by-zero (round-11 hardening)
        Some(
          melted.join(broadcast(spec), "__i")
            .select(
              col("check"),
              col("target"),
              when(col("__isCount"), col("__m"))
                .otherwise(expr("__m * 10000 div greatest(__n, 1)")).as("metric_bp"),
              col("threshold_bp"),
              when(col("__isCount"), col("__m") >= col("__lo") && col("__m") <= col("__hi"))
                .otherwise(expr("__m * 10000 div greatest(__n, 1)") >= col("threshold_bp"))
                .as("pass")))
      }

    val uniqueRows: Seq[DataFrame] = checks.collect { case Unique(c, minBp) =>
      df.groupBy(col(c)).agg(count(lit(1)).as("__c"))
        .agg(count(lit(1)).as("__d"), coalesce(sum("__c"), lit(0L)).as("__nn"))
        .select(
          lit("unique").as("check"), lit(c).as("target"),
          expr("__d * 10000 div greatest(__nn, 1)").as("metric_bp"),
          lit(minBp).as("threshold_bp"),
          expr(s"__d * 10000 div greatest(__nn, 1) >= ${minBp}L").as("pass"))
    }

    val fkRows: Seq[DataFrame] = checks.collect { case ForeignKey(c, ref, refCol) =>
      df.filter(col(c).isNotNull).select(col(c))
        .join(ref.select(col(refCol).as(c)).distinct(), Seq(c), "left_anti")
        .agg(count(lit(1)).as("__viol"))
        .select(
          lit("foreign_key").as("check"), lit(s"$c->$refCol").as("target"),
          col("__viol").cast("long").as("metric_bp"),
          lit(0L).as("threshold_bp"),
          (col("__viol") === 0L).as("pass"))
    }

    (scanRow.toSeq ++ uniqueRows ++ fkRows).reduce(_ unionByName _)
  }
}
