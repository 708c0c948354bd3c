package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HyperLogLog registers as a relational operator — cardinality sketching
  * for domains too large to `count(DISTINCT ...)`: each item hashes to a
  * bucket and a geometric "rank" (leading zeros of an independent hash
  * part), and the per-bucket MAX rank is all the sketch stores. m buckets
  * of one small int each answer "how many distinct?" within ~1.04/√m.
  *
  * The registers are the exact, engine-portable part — bucket and rank
  * are integer functions of md5 ([[Sampling]]'s determinism contract;
  * rank uses `33 − len(bin(x))`, integer in both engines), and MAX is
  * associative/commutative/idempotent, so registers merge across
  * partitions, groups, and streams by construction and a register table
  * is exactly SQL-oracle-able. Only the final ESTIMATE is floating-point;
  * it is computed driver-side from the collected m-row table
  * ([[estimate]]) and deliberately kept OUT of oracled outputs.
  *
  * Scale shape: one scan, partial-aggregated max per (group, bucket) —
  * shuffle volume ≤ groups·m rows whatever the item count. The classic
  * use: per-partition distinct-user/URL/token dashboards where exact
  * distinct would shuffle the full key domain.
  */
object Hll {

  /** Bucket (first 8 md5 hex chars mod 2^p) and rank (33 − bit-length of
    * the SECOND 8 hex chars; 33 when that 32-bit value is 0).
    */
  def bucket(item: Column, p: Int): Column =
    pmod(conv(substring(md5(item.cast("string")), 1, 8), 16, 10).cast("long"), lit(1L << p))

  def rank(item: Column): Column = {
    val x = conv(substring(md5(item.cast("string")), 9, 8), 16, 10).cast("long")
    when(x === 0L, lit(33)).otherwise(lit(33) - length(bin(x))).cast("int")
  }

  /** Per-group register table: (groupCols..., bucket, maxrank). Buckets no
    * item hashed into are absent (their register is implicitly 0 —
    * [[estimate]] accounts for them).
    */
  def registers(items: DataFrame, itemCol: String, p: Int, groupCols: Seq[String] = Seq.empty): DataFrame = {
    require(p >= 1 && p <= 16, s"p must be in [1,16]: $p")
    items
      .groupBy((groupCols.map(col) :+ bucket(col(itemCol), p).as("bucket")): _*)
      .agg(max(rank(col(itemCol))).as("maxrank"))
  }

  /** Register ALGEBRA: fold register rows down to new group keys with a
    * plain MAX — the merge that makes HLL sketches composable across
    * partitions, time windows, and hierarchies (registers(a ∪ b) =
    * mergeRegisters(registers(a) ∪ registers(b)), spec-pinned). E.g. a
    * sliding-window distinct count never re-touches the raw data: each
    * base period's registers explode to the windows they belong to and
    * fold here.
    */
  def mergeRegisters(registers: DataFrame, groupCols: Seq[String]): DataFrame =
    registers
      .groupBy((groupCols.map(col) :+ col("bucket")): _*)
      .agg(max(col("maxrank")).as("maxrank"))

  /** Standard HLL estimate with small-range (linear counting) correction,
    * from ONE group's registers — a bounded collect of ≤ 2^p rows.
    */
  def estimate(registers: DataFrame, p: Int): Double = {
    val m = 1 << p
    val present = registers.select("bucket", "maxrank").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val alpha = m match {
      case 16 => 0.673
      case 32 => 0.697
      case 64 => 0.709
      case _ => 0.7213 / (1 + 1.079 / m)
    }
    val z = (0 until m).map(b => math.pow(2.0, -present.getOrElse(b.toLong, 0))).sum
    val raw = alpha * m * m / z
    val zeros = m - present.count(_._2 > 0)
    if (raw <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros) else raw
  }

  /** Set-intersection estimate by inclusion–exclusion over the register
    * ALGEBRA: |A∩B| ≈ est(A) + est(B) − est(A∪B), where the union's
    * registers come from [[mergeRegisters]] — no raw data touched, so
    * two sketches built on different days (or different clusters)
    * intersect for free. Error compounds the three estimates' ~1.04/√m
    * bands and degrades as |A∩B|/|A∪B| shrinks — the standard HLL
    * caveat (Flajolet et al. 2007); for small overlaps use the exact
    * semi-join instead. Returns (estA, estB, estUnion, estIntersection);
    * the intersection is clamped at 0.
    */
  def intersectionEstimate(
      regA: DataFrame,
      regB: DataFrame,
      p: Int): (Double, Double, Double, Double) = {
    val ea = estimate(regA, p)
    val eb = estimate(regB, p)
    val eu = estimate(
      mergeRegisters(regA.select("bucket", "maxrank")
        .unionByName(regB.select("bucket", "maxrank")), Seq.empty), p)
    (ea, eb, eu, math.max(0.0, ea + eb - eu))
  }
}
