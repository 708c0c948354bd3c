package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loaders over the driver-generated testdata layout
  * (`TESTDATA.md`): one parquet file per table under a scale-factor dir.
  *
  * Scans stay fully declarative so Catalyst pushes filters/column pruning
  * into the parquet reader — at 100 TB the scan is the dominant cost and
  * `PushedFilters`/`ReadSchema` pruning is what keeps it bounded.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** The `events.ts` column has shipped in two physical shapes across
    * testdata generations, normalized here so every downstream operator
    * sees one logical type — µs-precision session-tz TimestampType:
    *
    *   - TIMESTAMP(NANOS): Spark 4 only reads it as a long (sessions set
    *     `spark.sql.legacy.parquet.nanosAsLong=true`) → `timestamp_micros(ns
    *     DIV 1000)`;
    *   - naive timestamp[us] (isAdjustedToUTC=false): Spark infers
    *     TIMESTAMP_NTZ, which `cast(ts as bigint)` / `unix_micros` reject →
    *     cast to TimestampType. Sessions run with session.timeZone=UTC, so
    *     the NTZ wall clock maps to the SAME microsecond values DuckDB's
    *     naive read produces — the oracle contract every events query
    *     depends on.
    *
    * Scoped to `events` only: a generic by-name rewrite would silently
    * corrupt a future table with a genuine long `ts` column.
    */
  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events")
      df.schema.fields.foldLeft(df) { (d, f) =>
        if (f.name == "ts" && f.dataType == org.apache.spark.sql.types.LongType)
          d.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts DIV 1000)"))
        else if (f.name == "ts" && f.dataType == org.apache.spark.sql.types.TimestampNTZType)
          d.withColumn("ts",
            org.apache.spark.sql.functions.col("ts").cast(org.apache.spark.sql.types.TimestampType))
        else d
      }
    else df
  }
}
