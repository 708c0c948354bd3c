package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Parallelism repair for EXPLODING pipelines fed by low-parallelism
  * scans (guide §2.5 input skew / §8 "use what you know"):
  *
  * A document corpus that is small in BYTES scans as very few input
  * splits (one split per ≤ `maxPartitionBytes`), and Spark chains every
  * narrow op — tokenize, signature explode, and, when the other join side
  * is broadcast, the candidate JOIN itself plus its partial aggregation —
  * into that scan stage. The result is a single task emitting tens of
  * millions of candidate rows while every other core idles (measured on
  * q50: an 18 s one-task stage writing 15.8 M pairs, 31 of 32 cores
  * idle). AQE cannot fix it: it coalesces by observed BYTE size, and a
  * doc-grain relation is tiny in bytes no matter how many join rows each
  * doc later explodes into — that multiplier is exactly what the engine
  * knows and the optimizer does not.
  *
  * [[spread]] hash-repartitions the doc-grain relation by key to the
  * session's shuffle parallelism BEFORE the explode — an exchange of the
  * small relation that buys full parallelism for the produce stage. The
  * partition count is pinned explicitly (an unpinned repartition is
  * AQE-coalesced right back to one partition for the same byte-size
  * reason). It is a no-op when the input already has comparable
  * parallelism — at production scale a large corpus scans as thousands
  * of splits and the repartition would be a pure extra shuffle, so this
  * fires only in the low-parallelism regime it repairs.
  */
object Spread {

  def spread(df: DataFrame, key: String): DataFrame = {
    val want = df.sparkSession.sessionState.conf.numShufflePartitions
    // physical partition count of the un-adaptive plan: file-split count
    // for scans, shuffle partition count downstream — no job is run
    val cur = df.rdd.getNumPartitions
    if (cur * 2 <= want) df.repartition(want, col(key)) else df
  }
}
