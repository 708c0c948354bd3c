package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Linear bag-of-hashed-tokens classifier INFERENCE — the fastText-shaped
  * quality/domain/language filter real curation pipelines run over every
  * document (CCNet's language model filter, LLaMA's "looks like a
  * reference" classifier): token → hash bucket (the hashing trick), score
  * per class = Σ bucket weights, label = argmax.
  *
  * Scale shape: a pure scan-level projection — the weight table ships to
  * executors as a literal array inside the plan (a real fastText matrix at
  * 2M buckets × few classes is tens of MB: exactly what Spark broadcasts;
  * here the same mechanics at fixture size), tokens never explode to rows,
  * and no shuffle exists anywhere. Buckets use the Java `String.hashCode`
  * ([[graft.functions.JavaStringHash]], codegen) so a SQL oracle replays
  * every bucket — and integer weights make every score exact: argmax never
  * rests on FP summation order (the S3M d2 lesson, applied by design).
  *
  * The token→bucket array is STAGED once and each per-class sum references
  * the staged array — the q58 CollapseProject lesson: a flat projection
  * would re-tokenize and re-hash once per class.
  */
object TextClassifier {

  /** Score every document against `nClasses` with a flat weight table
    * `weights(b * nClasses + c)` and keep the argmax (ties → smaller class
    * id). Output: (id, label, best_score).
    */
  def classifyHashedLinear(
      df: DataFrame,
      idCol: String,
      textCol: String,
      nClasses: Int,
      nBuckets: Int,
      weights: Seq[Long]): DataFrame = {
    require(nClasses > 0 && nBuckets > 0, s"bad shape: $nClasses classes, $nBuckets buckets")
    require(weights.length == nClasses * nBuckets,
      s"weights must be nBuckets*nClasses = ${nClasses * nBuckets} longs, got ${weights.length}")
    val w: Column = typedlit(weights)
    val toks = filter(split(col(textCol), " "), t => length(t) > 0)
    val buckets = transform(toks, t =>
      pmod(graft.functions.JavaStringHash.java_hash(t).cast("long"), lit(nBuckets.toLong)))
    val scores = (0 until nClasses).map { c =>
      aggregate(
        col("_bk"),
        lit(0L),
        (acc, b) => acc + element_at(w, (b * nClasses + c + 1).cast("int")))
    }
    df.select(col(idCol), buckets.as("_bk"))
      .select(col(idCol), array(scores: _*).as("_sc"))
      .select(
        col(idCol),
        (array_position(col("_sc"), array_max(col("_sc"))) - 1).as("label"),
        array_max(col("_sc")).as("best_score"))
  }

  /** Raw linear margin for ONE class — the binary-gate form (quality
    * classifiers ship as a single score; AUC/threshold calibration read
    * the raw margin, not the argmax). `weights` is the per-bucket vector
    * (length nBuckets). Output: (id, score). Same hashed-token scoring as
    * [[classifyHashedLinear]] with nClasses = 1.
    */
  def scoreLinear(
      df: DataFrame,
      idCol: String,
      textCol: String,
      nBuckets: Int,
      weights: Seq[Long]): DataFrame = {
    require(weights.length == nBuckets, s"need $nBuckets weights, got ${weights.length}")
    val w: Column = typedlit(weights)
    val toks = filter(split(col(textCol), " "), t => length(t) > 0)
    val buckets = transform(toks, t =>
      pmod(graft.functions.JavaStringHash.java_hash(t).cast("long"), lit(nBuckets.toLong)))
    df.select(col(idCol), buckets.as("_bk"))
      .select(
        col(idCol),
        aggregate(
          col("_bk"),
          lit(0L),
          (acc, b) => acc + element_at(w, (b + 1).cast("int"))).as("score"))
  }

  /** The q77 fixture weight table: w(b, c) = ((b·2654435761 + c·40503)
    * mod 1001) − 500 — deterministic integers standing in for a trained
    * matrix (the oracle replays the formula; a production caller passes
    * real trained weights through the same entry point).
    */
  def fixtureWeights(nClasses: Int, nBuckets: Int): Seq[Long] =
    for {
      b <- 0L until nBuckets.toLong
      c <- 0L until nClasses.toLong
    } yield ((b * 2654435761L + c * 40503L) % 1001L + 1001L) % 1001L - 500L
}
