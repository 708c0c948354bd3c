package graft

import org.apache.spark.sql.functions._

import graft.operators.SimilarityJoin

/** Hot-token behavior of the prefix-filtered similarity join
  * (SURVEY D4 for the J12 family):
  *
  *   1. the rarest-first order keeps a token present in 90% of documents
  *      out of EVERY emitted prefix — the frequent tokens that would
  *      dominate an inverted index never reach the join;
  *   2. when a hot token cannot be ordered away (an all-duplicates corpus
  *      where every token is equally hot), the candidate join's skewed
  *      partition is split by AQE's skew-join handling rather than
  *      funneling into one task.
  */
class PrefixSkewSpec extends SparkSpec {
  init()

  test("a 90%-hot token never enters any prefix under rarest-first order") {
    import spark.implicits._
    // 200 docs × 10 unique rare tokens each; docs 0..179 also carry "hot"
    val docs = (0 until 200).map { i =>
      val rares = (0 until 10).map(j => s"r${i}_$j")
      val toks = if (i < 180) rares :+ "hot" else rares
      (i.toLong, toks.mkString(" "))
    }.toDF("doc_id", "text")

    val toks = SimilarityJoin.tokenize(docs, "doc_id", "text")
    val freq = SimilarityJoin.tokenFrequencies(toks)
    val prefixes = SimilarityJoin.orderedPrefixes(
      SimilarityJoin.orderByFrequency(toks, freq), tau = 0.8)

    assert(prefixes.filter(col("tok") === "hot").isEmpty,
      "hot token leaked into a prefix")
    // every doc still emits its s − ⌈τ·s⌉ + 1 rare tokens
    val emitted = prefixes.groupBy("sid").count().select(min("count"), max("count")).head()
    assert(emitted.getLong(0) >= 3 && emitted.getLong(1) <= 4, emitted.toString)
  }

  test("AQE splits the skewed candidate partition when a hot token is unavoidable") {
    import spark.implicits._
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled",
      "spark.sql.shuffle.partitions")
      .map(k => k -> scala.util.Try(conf.get(k)).toOption).toMap
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "2KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1KB")
      conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      conf.set("spark.sql.shuffle.partitions", "16")

      // graded-df corpus where the hot token CANNOT be ordered out: every
      // doc shares the filler pool q1..q6 (df=400, most frequent), so each
      // doc's prefix is its rarer head token + q1. Group 1's head is the
      // SAME "big" token (df=200) while group 2 spreads over b_0..b_7
      // (df=25): the tok-join partition holding q1 (400 rows each side)
      // dwarfs the median b_k partition — unavoidable, detectable skew
      val pool = (1 to 6).map(j => s"q$j").mkString(" ")
      val docs = (
        (0 until 200).map(i => (i.toLong, s"big $pool")) ++
          (0 until 200).map(i => ((200 + i).toLong, s"b_${i % 8} $pool"))
      ).toDF("doc_id", "text")
      val toks = SimilarityJoin.tokenize(docs, "doc_id", "text")
      val freq = SimilarityJoin.tokenFrequencies(toks)
      val ord = SimilarityJoin.orderByFrequency(toks, freq)
      val px = SimilarityJoin.orderedPrefixes(ord, tau = 0.8)
        .select(col("sid").as("x_id"), col("tok"))
      val iy = SimilarityJoin.orderedPrefixes(ord, tau = 0.8)
        .select(col("sid").as("y_id"), col("tok"))
      val cand = px.join(iy, "tok").filter(col("x_id") < col("y_id"))

      cand.collect() // materialize so AQE finalizes the plan
      val plan = cand.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"), s"no skew-split in final plan:\n$plan")
    } finally {
      saved.foreach {
        case (k, Some(v)) => conf.set(k, v)
        case (k, None)    => conf.unset(k)
      }
    }
  }
}
