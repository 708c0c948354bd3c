package graft

import org.apache.spark.sql.functions._

import graft.operators.Drift

class DriftSpec extends SparkSpec {
  init()

  import spark.implicits._

  test("chi drift: exact bp shares, movers ranked, one-sided buckets alarm") {
    // ref: x=6, y=3, z=1 of 10; cur: x=2, y=6, w=2 of 10 (z vanished, w new)
    val ref = (Seq.fill(6)("x") ++ Seq.fill(3)("y") ++ Seq("z")).toDF("b")
    val cur = (Seq.fill(2)("x") ++ Seq.fill(6)("y") ++ Seq.fill(2)("w")).toDF("b")
    val got = Drift.chiDrift(ref, cur, "b")
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap
    // x: 6000 vs 2000 -> 4000^2*10000/8000 = 20 000 000
    assert(got("x") == ((6L, 2L, 6000L, 2000L, 4000L * 4000L * 10000L / 8000L)))
    // y: 3000 vs 6000 -> 3000^2*10000/9000 = 10 000 000
    assert(got("y") == ((3L, 6L, 3000L, 6000L, 3000L * 3000L * 10000L / 9000L)))
    // vanished z and new w score against a 0 share: bp^2*10000/bp = bp*10000
    assert(got("z") == ((1L, 0L, 1000L, 0L, 1000L * 10000L)))
    assert(got("w") == ((0L, 2L, 0L, 2000L, 2000L * 10000L)))
  }

  test("identical snapshots score zero everywhere") {
    val df = (Seq.fill(4)("x") ++ Seq.fill(4)("y")).toDF("b")
    val got = Drift.chiDrift(df, df, "b")
      .as[(String, Long, Long, Long, Long, Long)].collect()
    assert(got.forall(_._6 == 0L), got.mkString(","))
  }

  test("chi_drift TVF matches the operator") {
    val ref = spark.read.parquet(s"$sfSmoke/documents.parquet")
      .filter(pmod(col("doc_id"), lit(2)) === 0)
    val cur = spark.read.parquet(s"$sfSmoke/documents.parquet")
      .filter(pmod(col("doc_id"), lit(2)) === 1)
    ref.createOrReplaceTempView("drift_ref")
    cur.createOrReplaceTempView("drift_cur")
    val sqlDf = spark.sql("SELECT * FROM chi_drift('drift_ref', 'drift_cur', 'lang')")
    val scalaDf = Drift.chiDrift(
      spark.table("drift_ref"), spark.table("drift_cur"), "lang")
    assert(sqlDf.columns.toSeq == scalaDf.columns.toSeq)
    assert(sqlDf.exceptAll(scalaDf).isEmpty && scalaDf.exceptAll(sqlDf).isEmpty)
  }
}
