package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Explicit skew-salting for hot join keys (SURVEY D4 — the reference's
  * frequency-weighted `SimilarityQueryPartitioner`,
  * `DSim-Join/src/main/scala/ds_join/SimilarityQueryPartitioner.scala.scala:31-56`,
  * re-expressed declaratively). AQE's skew-join handles most cases at
  * runtime; explicit salting is for the pathological key whose single hash
  * partition exceeds what one task should own regardless of AQE splits —
  * e.g. a signature shared by half the corpus.
  *
  * Shape: the SKEWED side gets a random-but-deterministic salt in
  * [0, salts); the other side is replicated `salts` times; the join key
  * becomes (key, salt). Same join result, `salts`-way parallel hot keys.
  */
object Salting {

  /** Salt the skewed (probe) side: adds `__salt` from a deterministic hash
    * of the whole row (not the key — the point is to SPREAD identical
    * keys).
    */
  def saltProbe(df: DataFrame, salts: Int): DataFrame =
    df.withColumn("__salt", pmod(xxhash64(df.columns.map(col): _*), lit(salts)).cast("int"))

  /** Replicate the build side across all salt values. */
  def replicateBuild(df: DataFrame, salts: Int): DataFrame =
    df.withColumn("__salt", explode(sequence(lit(0), lit(salts - 1))))

  /** Salted inner equi-join on `key`: equivalent to
    * `probe.join(build, key)` with hot keys spread over `salts` tasks.
    */
  def saltedJoin(probe: DataFrame, build: DataFrame, key: String, salts: Int): DataFrame =
    saltProbe(probe, salts)
      .join(replicateBuild(build, salts), Seq(key, "__salt"))
      .drop("__salt")
}
