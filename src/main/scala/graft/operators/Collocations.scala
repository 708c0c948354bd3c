package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Collocation (phrase) mining: rank word bigrams by a PMI-style lift
  * score — how much more often the pair co-occurs than its parts'
  * frequencies predict. The phrase-discovery pass a tokenizer/vocab
  * pipeline runs before merging multi-word units (the word2phrase /
  * BPE-seed shape).
  *
  * Score: lift = c(xy)·N / (c(x)·c(y)) (the exponential of PMI —
  * monotone in it, so the ranking is PMI's). Computed as ONE double
  * multiply and ONE divide of exactly-converted integers — every IEEE
  * step correctly rounded, so the value (and its round-to-4) is
  * bit-identical in any engine; no FP sums anywhere (the repo-wide
  * oracle-exactness recipe, same as the k-means distance).
  *
  * Scale shape: two token-stream aggregations (unigrams, bigrams — both
  * map-side combined), two hash joins of the bigram table against the
  * unigram table on its word columns, a min-support filter BEFORE the
  * joins (drops the long tail — at web scale most distinct bigrams are
  * singletons), and the sharded global [[TopK]].
  */
object Collocations {

  /** Top-k bigrams by lift: (gram, x, y, cxy, cx, cy, lift, rk).
    *
    * @param minCount minimum bigram occurrences (support filter, applied
    *                 before any join)
    */
  def topByLift(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      minCount: Long,
      k: Int): DataFrame = {
    require(minCount >= 1 && k >= 1)
    val toks = filter(split(col(textCol), " "), t => length(t) > 0)
    val words = docs.select(explode(toks).as("w"))
    val uni = words.groupBy("w").agg(count(lit(1)).as("c"))
    val pairs = docs
      .select(explode(when(
        size(toks) >= 2,
        transform(sequence(lit(0), size(toks) - 2),
          i => struct(element_at(toks, i + 1).as("x"), element_at(toks, i + 2).as("y"))))
        .otherwise(array().cast("array<struct<x:string,y:string>>"))).as("p"))
      .select(col("p.x").as("x"), col("p.y").as("y"))
    val bi = pairs.groupBy("x", "y").agg(count(lit(1)).as("cxy"))
      .filter(col("cxy") >= minCount)
    val n = pairs.agg(count(lit(1)).as("n"))
    val scored = bi
      .join(uni.select(col("w").as("x"), col("c").as("cx")), "x")
      .join(uni.select(col("w").as("y"), col("c").as("cy")), "y")
      .crossJoin(broadcast(n))
      .withColumn(
        "lift",
        round(
          col("cxy").cast("double") * col("n").cast("double") /
            (col("cx").cast("double") * col("cy").cast("double")),
          4))
      .withColumn("gram", concat_ws(" ", col("x"), col("y")))
    TopK
      .perGroup(
        scored.select("gram", "x", "y", "cxy", "cx", "cy", "lift"),
        groupCols = Seq.empty,
        order = Seq(col("lift").desc, col("gram").asc),
        k = k)
  }
}
