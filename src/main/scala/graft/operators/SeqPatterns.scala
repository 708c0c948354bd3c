package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequential trigram mining with a Markov-surprise score — the
  * second-order sibling of [[Transitions]]: which three-step behavior
  * patterns a → b → c occur MORE than the first-order chain predicts?
  * Under the Markov model the expected trigram count is
  * n(a,b)·n(b,c)/n(b·) (n(b·) = transitions out of b), so
  *   surprise_bp = (10⁴·n_abc·n_b) div (n_ab·n_bc)
  * reads 10000 = exactly chain-predicted, above = genuine sequential
  * structure (the classic likelihood-ratio numerator, engine-exact).
  * Support counts distinct keys so one looping user cannot fake a
  * pattern.
  *
  * Scale shape: ONE per-key lag window (the sessionization bound,
  * [[HotKeyGuard]] names it) emitting each position's (a, b, c) once,
  * then state²/state³-bounded grouped counts and three broadcast-sized
  * joins — pattern relations never scale with rows, only with the
  * alphabet. Count products ride DECIMAL(38,0).
  *
  * Output: (a, b, c, n, users, surprise_bp) for trigrams with
  * `users ≥ minSupport`.
  */
object SeqPatterns {

  def trigramSurprise(
      df: DataFrame,
      keyCol: String,
      tsCol: String,
      tiebreakCol: String,
      stateCol: String,
      minSupport: Long = 1L,
      maxEventsPerKey: Long = 1000000L): DataFrame = {
    require(minSupport >= 1, s"SeqPatterns.trigramSurprise: minSupport >= 1, got $minSupport")
    val ev0 = df.select(
      col(keyCol).as("k"),
      col(tsCol).cast("long").as("t"),
      col(tiebreakCol).cast("long").as("tb"),
      col(stateCol).cast("string").as("a"))
    val ev = HotKeyGuard(ev0, col("k"), maxEventsPerKey, "SeqPatterns.trigramSurprise")
    val w = Window.partitionBy("k").orderBy(col("t"), col("tb"))
    val base = ev
      .withColumn("b", lead("a", 1).over(w))
      .withColumn("c", lead("a", 2).over(w))
    val pairs = base.filter(col("b").isNotNull)
      .groupBy("a", "b").agg(count(lit(1)).as("n_ab"))
    val outOf = pairs.groupBy("a").agg(sum("n_ab").as("n_out"))
    val tris = base.filter(col("c").isNotNull)
      .groupBy("a", "b", "c")
      .agg(count(lit(1)).as("n"), countDistinct("k").as("users"))
    tris
      .filter(col("users") >= minSupport)
      .join(broadcast(pairs), Seq("a", "b"))
      .join(
        broadcast(pairs.select(col("a").as("b"), col("b").as("c"), col("n_ab").as("n_bc"))),
        Seq("b", "c"))
      .join(broadcast(outOf.select(col("a").as("b"), col("n_out").as("n_b"))), "b")
      .select(
        col("a"), col("b"), col("c"), col("n"), col("users"),
        expr(
          """(10000 * CAST(n AS DECIMAL(38,0)) * n_b)
            |  div (CAST(n_ab AS DECIMAL(38,0)) * n_bc)""".stripMargin)
          .as("surprise_bp"))
  }
}
