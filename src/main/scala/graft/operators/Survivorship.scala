package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Survivorship — the golden-record merge of master-data management:
  * after near-duplicate CLUSTERING ([[Dedup]] components), each cluster's
  * rows fold into one released record, field by field, under explicit
  * per-field rules. Cluster dedup answers "which rows are the same
  * thing"; survivorship answers "what do we SAY about that thing" — the
  * step a curation pipeline runs before shipping one canonical document
  * per duplicate class.
  *
  * Every rule is a deterministic total order, so the golden record is
  * execution-order-free and SQL-replayable:
  *   - `longest`: the value maximizing (length, value) — longest wins,
  *     exact-length ties break to the lexicographically largest;
  *   - `mode`: the most frequent value, ties to the smallest value (the
  *     (count desc, value asc) argmax — NOT the engine's native mode(),
  *     whose tie choice is unspecified and differs across engines);
  *   - `max`: plain maximum; canonical id: plain minimum.
  *
  * Scale shape: one map-side-combinable aggregation per rule family over
  * the cluster key, plus one (cluster, value)-grain count per mode
  * column — clusters are the join key everywhere, nothing pairs all
  * rows. Mode columns each cost one extra counts aggregation joined back
  * cluster-keyed.
  */
object Survivorship {

  def goldenRecord(
      df: DataFrame,
      clusterCol: String,
      idCol: String,
      longestCols: Seq[String] = Seq.empty,
      maxCols: Seq[String] = Seq.empty,
      modeCols: Seq[String] = Seq.empty): DataFrame = {
    require(
      longestCols.nonEmpty || maxCols.nonEmpty || modeCols.nonEmpty,
      "goldenRecord needs at least one survivorship rule column")
    val baseAggs =
      Seq(count(lit(1)).as("n_members"), min(col(idCol)).as("canonical_id")) ++
        longestCols.map(c =>
          max(struct(length(col(c)).as("l"), col(c).as("v"))).getField("v").as(c)) ++
        maxCols.map(c => max(col(c)).as(c))
    val base = df.groupBy(col(clusterCol)).agg(baseAggs.head, baseAggs.tail: _*)
    modeCols.foldLeft(base) { (acc, c) =>
      val m = df.groupBy(col(clusterCol), col(c))
        .agg(count(lit(1)).as("__cnt"))
        .groupBy(col(clusterCol))
        .agg(min_by(col(c), struct((-col("__cnt")).as("nc"), col(c).as("v"))).as(c))
      acc.join(m, clusterCol)
    }
  }
}
