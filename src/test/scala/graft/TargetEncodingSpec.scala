package graft

import graft.operators.TargetEncoding

class TargetEncodingSpec extends SparkSpec {
  init()
  import spark.implicits._

  private val rows: Seq[(Long, String, Long)] = Seq(
    (1L, "a", 1L), (2L, "a", 0L), (3L, "a", 1L),
    (4L, "b", 1L), (5L, "b", 1L),
    (6L, "c", 0L)) // singleton -> prior

  private def run(rs: Seq[(Long, String, Long)]): Map[Long, Long] =
    TargetEncoding.leaveOneOut(rs.toDF("id", "cat", "y"), "id", "cat", "y")
      .as[(Long, String, Long, Long)].collect().map(r => r._1 -> r._4).toMap

  test("hand-computed LOO values; singleton gets the global prior") {
    val got = run(rows)
    // prior = 4/6 -> 666666 ppm
    assert(got(1L) == 500000L) // (2-1)/2
    assert(got(2L) == 1000000L) // (2-0)/2
    assert(got(3L) == 500000L)
    assert(got(4L) == 1000000L) // (2-1)/1
    assert(got(5L) == 1000000L)
    assert(got(6L) == 666666L)
  }

  test("a row never sees its own label: flipping it leaves its own encoding unchanged") {
    // flipping row 1's label changes OTHER a-rows' encodings, not row 1's
    // numerator... its own encoding uses only rows 2 and 3
    val flipped = rows.map { case (id, c, y) => if (id == 1L) (id, c, 0L) else (id, c, y) }
    assert(run(rows)(1L) == run(flipped)(1L))
    assert(run(rows)(2L) != run(flipped)(2L))
  }

  test("bad labels fail by name; deterministic under repartition") {
    val ex = intercept[Exception] {
      TargetEncoding.leaveOneOut(Seq((1L, "a", 7L)).toDF("id", "cat", "y"),
        "id", "cat", "y").collect()
    }
    assert(ex.getMessage.contains("label must be 0 or 1")
      || ex.getCause != null && ex.getCause.getMessage.contains("label must be 0 or 1"))
    val big = (0 until 600).map(i => (i.toLong, "c" + i % 7, (i % 2).toLong))
    val a = TargetEncoding.leaveOneOut(big.toDF("id", "cat", "y"), "id", "cat", "y")
      .orderBy("id").collect().toSeq
    val b = TargetEncoding.leaveOneOut(big.toDF("id", "cat", "y").repartition(9),
        "id", "cat", "y")
      .orderBy("id").collect().toSeq
    assert(a == b)
  }
}
