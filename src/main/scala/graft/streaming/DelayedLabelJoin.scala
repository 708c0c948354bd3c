package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream join for delayed labels — the idiomatic Structured
  * Streaming alternative (SURVEY M9) to the driver-side
  * [[graft.ml.DelayedLabelBuffer]] queue (reference `s3m.scala:73-130`
  * enqueues features and dequeues them once the label observation arrives
  * `delay` windows later).
  *
  * Shape: the features stream and the labels stream are both watermarked
  * on their event-time columns; an inner equi-join on the window id plus
  * the time-range predicate `labelTime ∈ [featureTime, featureTime +
  * maxDelay]` lets Spark bound BOTH join-state buffers — feature rows are
  * dropped from state once the label-side watermark passes their admissible
  * label window, label rows symmetrically. This is the canonical
  * watermarked interval-join pattern; state is bounded by (rate ×
  * maxDelay), independent of stream length — the property the driver queue
  * only gets by being tiny.
  */
object DelayedLabelJoin {

  /** Join a features stream with a later-arriving labels stream.
    *
    * @param features   streaming DataFrame with `idCol` and timestamp
    *                   `featureTimeCol`
    * @param labels     streaming DataFrame with `idCol`, timestamp
    *                   `labelTimeCol`, and the label payload column(s)
    * @param maxDelay   SQL interval string bounding label lateness relative
    *                   to the feature event (e.g. "10 minutes") — also the
    *                   watermark on both sides
    * @return the joined stream: one row per (feature, label) pair whose
    *         label arrived within `maxDelay`
    */
  def join(
      features: DataFrame,
      labels: DataFrame,
      idCol: String,
      featureTimeCol: String,
      labelTimeCol: String,
      maxDelay: String): DataFrame = {
    val f = features.withWatermark(featureTimeCol, maxDelay)
    val l = labels
      .withColumnRenamed(idCol, s"__label_$idCol")
      .withWatermark(labelTimeCol, maxDelay)
    f.join(
        l,
        col(idCol) === col(s"__label_$idCol") &&
          col(labelTimeCol) >= col(featureTimeCol) &&
          col(labelTimeCol) <= col(featureTimeCol) + expr(s"interval $maxDelay"))
      .drop(s"__label_$idCol")
  }
}
