package graft

import org.apache.spark.sql.functions._

import graft.operators.Hll

/** HLL register invariants (idempotence, mergeability) and estimator
  * accuracy — the parts the SQL oracle can't express.
  */
class HllSpec extends SparkSpec {
  init()
  import spark.implicits._

  test("registers are multiplicity-blind (max is idempotent)") {
    val once = (0 until 500).map(i => s"v$i").toDF("v")
    val thrice = (0 until 500).flatMap(i => Seq.fill(3)(s"v$i")).toDF("v")
    val a = Hll.registers(once, "v", p = 6).orderBy("bucket").collect().toSeq
    val b = Hll.registers(thrice, "v", p = 6).orderBy("bucket").collect().toSeq
    assert(a == b)
  }

  test("registers merge: max of parts == registers of the union") {
    val xs = (0 until 400).map(i => s"x$i")
    val (l, r) = xs.splitAt(200)
    val whole = Hll.registers(xs.toDF("v"), "v", p = 5).orderBy("bucket").collect().toSeq
    val merged = Hll.registers(l.toDF("v"), "v", p = 5)
      .unionByName(Hll.registers(r.toDF("v"), "v", p = 5))
      .groupBy("bucket").agg(max("maxrank").as("maxrank"))
      .orderBy("bucket").collect().toSeq
    assert(whole == merged)
  }

  test("mergeRegisters refolds to coarser groups exactly") {
    val df = Seq(
      ("h1", "u1"), ("h1", "u2"), ("h2", "u2"), ("h2", "u3"), ("h3", "u4"))
      .toDF("h", "u")
    val perHour = Hll.registers(df, "u", p = 4, groupCols = Seq("h"))
    val merged = Hll.mergeRegisters(perHour, Seq.empty)
      .orderBy("bucket").collect().toSeq
    val direct = Hll.registers(df, "u", p = 4)
      .orderBy("bucket").collect().toSeq
    assert(merged == direct)
  }

  test("estimate lands within the expected error band") {
    for (n <- Seq(100, 2000, 20000)) {
      val df = (0 until n).map(i => s"item-$i").toDF("v")
      val est = Hll.estimate(Hll.registers(df, "v", p = 8), p = 8)
      // 1.04/sqrt(256) ≈ 6.5% standard error; allow 4 sigma
      assert(math.abs(est - n) / n < 0.26, s"n=$n est=$est")
    }
  }

  test("intersection estimate: inclusion-exclusion recovers a known overlap") {
    // A = [0, 6000), B = [4000, 10000): |A∩B| = 2000, |A∪B| = 10000
    val a = (0 until 6000).map(i => s"k$i").toDF("v")
    val b = (4000 until 10000).map(i => s"k$i").toDF("v")
    val (ea, eb, eu, ei) = Hll.intersectionEstimate(
      Hll.registers(a, "v", p = 10), Hll.registers(b, "v", p = 10), p = 10)
    assert(math.abs(ea - 6000) / 6000 < 0.15, s"estA=$ea")
    assert(math.abs(eb - 6000) / 6000 < 0.15, s"estB=$eb")
    assert(math.abs(eu - 10000) / 10000 < 0.15, s"estU=$eu")
    // intersection compounds three bands; 2000 ± generous margin
    assert(ei > 800 && ei < 3200, s"estI=$ei")
  }

  test("disjoint sets intersect to (clamped) near zero") {
    val a = (0 until 3000).map(i => s"a$i").toDF("v")
    val b = (0 until 3000).map(i => s"b$i").toDF("v")
    val (_, _, _, ei) = Hll.intersectionEstimate(
      Hll.registers(a, "v", p = 10), Hll.registers(b, "v", p = 10), p = 10)
    assert(ei >= 0.0 && ei < 600.0, s"estI=$ei")
  }
}
