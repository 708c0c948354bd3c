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

  /** Sessions must set `spark.sql.legacy.parquet.nanosAsLong=true`: the
    * `events` table carries TIMESTAMP(NANOS) which Spark 4 only reads as a
    * long; we convert back to a µs TimestampType here so downstream
    * operators see a real timestamp column.
    */
  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    // Scoped to `events` only: it is the one table written with
    // TIMESTAMP(NANOS). A generic by-name rewrite would silently corrupt any
    // future table with a genuine long `ts` column (e.g. epoch millis).
    if (name == "events")
      df.schema.fields.foldLeft(df) { (d, f) =>
        if (f.name == "ts" && f.dataType == org.apache.spark.sql.types.LongType)
          d.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts DIV 1000)"))
        else d
      }
    else df
  }
}
