package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distributed Bloom-filter build + native codegen membership probe — the
  * set-membership primitive a 100 TB pipeline uses when the member set is
  * too large (or too hot) to hash-join every row against.
  *
  * Shape: [[build]] folds the member column into an `Array[Long]` bitset
  * with one partial bitset per partition OR-merged on the driver (the same
  * partial-aggregate shape as a map-side-combined count: executor work is
  * one pass, driver work is `partitions × m/64` longs). The probe side is
  * [[BloomMightContain]], a codegen `UnaryExpression` that ships the
  * bitset to executors inside the expression tree (Spark torrent-broadcasts
  * task binaries, so a ~MB filter costs one broadcast, not a per-task
  * copy) and tests k bit positions per row inside whole-stage codegen.
  *
  * Hashing is Kirsch–Mitzenmacher double hashing over the two 64-bit
  * halves of MD5 (`h_i = h1 + i·h2`): two digest reads give all k probes,
  * and MD5 keeps the whole construction engine-portable/deterministic —
  * the property every oracled operator in this repo builds on ([[graft.operators.Sampling]]).
  *
  * No false negatives by construction, so any exact verify step placed
  * after the probe makes Bloom a pure pre-filter: results are
  * bit-identical to the unfiltered plan while the expensive join sees only
  * the (true hits + fpp·volume) survivors. That is how
  * [[graft.operators.Decontamination.flagBloom]] uses it.
  */
object BloomFilter {

  /** Optimal bit count for n items at false-positive rate fpp, rounded up
    * to a multiple of 64 (m = -n·ln(fpp)/ln(2)²).
    */
  def numBits(expectedItems: Long, fpp: Double): Long = {
    require(fpp > 0 && fpp < 1, s"fpp must be in (0,1): $fpp")
    val n = math.max(expectedItems, 1L)
    val m = math.ceil(-n * math.log(fpp) / (math.log(2) * math.log(2))).toLong
    ((m + 63) / 64) * 64
  }

  /** Optimal hash count k = (m/n)·ln(2), clamped to [1, 16]. */
  def numHashes(numBits: Long, expectedItems: Long): Int = {
    val k = math.round(numBits.toDouble / math.max(expectedItems, 1L) * math.log(2)).toInt
    math.min(math.max(k, 1), 16)
  }

  // MessageDigest is not thread-safe and ~1µs to construct; the probe runs
  // per row inside codegen, so reuse one instance per executor thread.
  private val digest = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** Big-endian long from 8 digest bytes starting at `off`. */
  private def beLong(d: Array[Byte], off: Int): Long = {
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(off + i) & 0xffL); i += 1 }
    v
  }

  /** Set the k bit positions of `s` in `bits` (mutates). */
  def add(bits: Array[Long], k: Int, s: UTF8String): Unit = {
    val md = digest.get(); md.reset()
    val d = md.digest(s.getBytes)
    val h1 = beLong(d, 0)
    val h2 = beLong(d, 8)
    val m = bits.length.toLong * 64
    var i = 0
    while (i < k) {
      val pos = ((h1 + i * h2) & Long.MaxValue) % m
      bits((pos >>> 6).toInt) |= (1L << (pos & 63))
      i += 1
    }
  }

  /** Test the k bit positions of `s` in `bits`. */
  def mightContain(bits: Array[Long], k: Int, s: UTF8String): Boolean = {
    val md = digest.get(); md.reset()
    val d = md.digest(s.getBytes)
    val h1 = beLong(d, 0)
    val h2 = beLong(d, 8)
    val m = bits.length.toLong * 64
    var i = 0
    while (i < k) {
      val pos = ((h1 + i * h2) & Long.MaxValue) % m
      if ((bits((pos >>> 6).toInt) & (1L << (pos & 63))) == 0L) return false
      i += 1
    }
    true
  }

  /** Build a Bloom filter over the (non-null) values of a string column.
    * One pass, one partial bitset per partition, OR-fold on the driver —
    * the only driver-sized object is the filter itself.
    */
  def build(df: DataFrame, colName: String, fpp: Double, expectedItems: Long): BuiltBloom = {
    val m = numBits(expectedItems, fpp)
    val k = numHashes(m, expectedItems)
    val words = (m / 64).toInt
    import df.sparkSession.implicits._
    val values = df.select(org.apache.spark.sql.functions.col(colName).cast("string")).as[String]
    // fold, not reduce: a zero-partition/zero-row input (empty eval
    // relation reaching Decontamination.flagBloom) yields the all-zero
    // filter instead of reduce's "empty collection" throw
    val bits = values
      .mapPartitions { it =>
        val b = new Array[Long](words)
        it.foreach { s => if (s != null) add(b, k, UTF8String.fromString(s)) }
        Iterator.single(b)
      }
      .rdd
      .fold(new Array[Long](words)) { (a, b) =>
        var i = 0
        while (i < a.length) { a(i) |= b(i); i += 1 }
        a
      }
    BuiltBloom(bits, k)
  }

  /** A built filter plus its probe entry points. */
  final case class BuiltBloom(bits: Array[Long], k: Int) {

    /** Probe as a Column — registers a uniquely-named temp function so the
      * expression route (and therefore whole-stage codegen) carries the
      * bitset; call from the session that runs the plan.
      */
    def mightContainCol(spark: SparkSession, c: Column): Column = {
      val name = s"bloom_probe_${java.util.UUID.randomUUID().toString.replace("-", "")}"
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name,
        exprs => BloomMightContain(bits, k, exprs.head),
        "built-in")
      org.apache.spark.sql.functions.call_function(name, c)
    }

    /** Saturation (fraction of set bits) — the health metric: ≥ ~0.5 means
      * the filter was sized for fewer items than it received and fpp has
      * degraded.
      */
    def saturation: Double =
      bits.map(java.lang.Long.bitCount(_).toLong).sum.toDouble / (bits.length.toLong * 64)
  }
}

/** `mightContain(bits, child)` as a native codegen expression. The bitset
  * rides the expression (→ task binary → torrent broadcast), not a child
  * literal — a 16K-element array literal would explode generated code.
  */
case class BloomMightContain(bits: Array[Long], k: Int, child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(
          s"bloom_might_contain requires a string argument, got ${other.catalogString}")
    }

  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(v: Any): Any =
    BloomFilter.mightContain(bits, k, v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bitsRef = ctx.addReferenceObj("bloomBits", bits, "long[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.BloomFilter.mightContain($bitsRef, $k, $c);")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)

  override def prettyName: String = "bloom_might_contain"
}
