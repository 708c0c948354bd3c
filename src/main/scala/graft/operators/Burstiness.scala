package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Burstiness per key — the Fano factor (index of dispersion) of a
  * key's per-bucket event counts over a FIXED bucket domain: Var/mean,
  * with 10⁶ = Poisson (memoryless), above = bursty (sessions, scripted
  * spikes, retry storms), below = regular (schedulers, rate-limited
  * bots). The classic behavioral fingerprint that separates humans from
  * automation without reading a single payload.
  *
  * Empty buckets COUNT (a key active one hour out of B is maximally
  * bursty), which is exactly what makes the naive per-key variance
  * wrong to compute from observed buckets alone; with S = Σ counts and
  * SS = Σ counts² over the key's non-empty buckets and B the domain
  * size, Var/mean = (B·SS − S²)/(B·S) — so
  *   fano_ppm = (10⁶·(B·SS − S²)) div (B·S)
  * needs only the non-empty grain. B is taken from the DATA's span
  * (max − min bucket + 1, one broadcast scalar), the same domain for
  * every key. Engine-exact; products ride DECIMAL(38,0).
  *
  * Scale shape: one groupBy to (key, bucket) grain, one to key grain,
  * one broadcast single-row domain. Output:
  * (k, n_events, n_active_buckets, fano_ppm), keys with S = 0 absent.
  */
object Burstiness {

  def fano(df: DataFrame, keyCol: String, bucketCol: String): DataFrame = {
    val grain = df
      .select(col(keyCol).as("k"), col(bucketCol).cast("long").as("b"))
      .groupBy("k", "b")
      .agg(count(lit(1)).as("c"))
    val domain = grain.agg((max("b") - min("b") + 1L).cast("decimal(38,0)").as("bb"))
    grain
      .groupBy("k")
      .agg(
        sum("c").cast("decimal(38,0)").as("s"),
        sum(expr("CAST(c AS DECIMAL(38,0)) * c")).as("ss"),
        count(lit(1)).as("n_active_buckets"))
      .crossJoin(broadcast(domain))
      .select(
        col("k"),
        col("s").cast("long").as("n_events"),
        col("n_active_buckets"),
        expr("(1000000 * (bb * ss - s * s)) div (bb * s)").as("fano_ppm"))
  }
}
