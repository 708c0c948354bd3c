package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.Prop.forAll

import graft.functions.ArrayIntersectSize

class ArrayIntersectSizeSpec extends SparkSpec {
  init()

  test("intersect_size equals size(array_intersect) on arbitrary token sets") {
    import spark.implicits._
    ArrayIntersectSize.register(spark)
    val gen = for {
      a <- Gen.listOf(Gen.choose(0, 50).map(i => s"t$i"))
      b <- Gen.listOf(Gen.choose(0, 50).map(i => s"t$i"))
    } yield (a.distinct, b.distinct)
    val cases = Gen.listOfN(200, gen).sample.get
    val df = cases.toDF("a", "b")
      .select(
        ArrayIntersectSize.intersect_size(col("a"), col("b")).as("got"),
        size(array_intersect(col("a"), col("b"))).as("want"))
    assert(df.filter(col("got") =!= col("want")).isEmpty, "fused count diverged")

    // interpreted path agrees with the codegen'd result
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(200),
      forAll(gen) { case (a, b) =>
        val expected = a.toSet.intersect(b.toSet).size
        val got = ArrayIntersectSize.intersectSize(
          org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
            a.map(org.apache.spark.unsafe.types.UTF8String.fromString).toArray),
          org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
            b.map(org.apache.spark.unsafe.types.UTF8String.fromString).toArray))
        Prop(got == expected) :| s"a=$a b=$b got=$got want=$expected"
      })
    assert(res.passed, res.status.toString)
  }

  test("intersect_size on bigint arrays (hashed-token tier) equals array_intersect") {
    import spark.implicits._
    ArrayIntersectSize.register(spark)
    val gen = for {
      a <- Gen.listOf(Gen.choose(-25L, 25L))
      b <- Gen.listOf(Gen.choose(-25L, 25L))
    } yield (a.distinct, b.distinct)
    val cases = Gen.listOfN(200, gen).sample.get
    val df = cases.toDF("a", "b")
      .select(
        ArrayIntersectSize.intersect_size(col("a"), col("b")).as("got"),
        size(array_intersect(col("a"), col("b"))).as("want"))
    assert(df.filter(col("got") =!= col("want")).isEmpty, "long kernel diverged")
  }

  test("intersect_size runs inside whole-stage codegen on a real scan") {
    ArrayIntersectSize.register(spark)
    graft.core.Tables(spark, sfSmoke, "documents").createOrReplaceTempView("is_docs")
    val df = spark.sql(
      """SELECT doc_id, intersect_size(split(text, ' '), split(text, ' ')) AS n
        |FROM is_docs""".stripMargin)
    assert(df.limit(5).collect().forall(!_.isNullAt(1)))
    val inCodegen = df.queryExecution.executedPlan
      .find(_.isInstanceOf[org.apache.spark.sql.execution.WholeStageCodegenExec])
      .isDefined
    assert(inCodegen, df.queryExecution.executedPlan.toString)
  }

  test("intersect_size rejects non-array input at analysis time") {
    ArrayIntersectSize.register(spark)
    import spark.implicits._
    val e = intercept[Exception] {
      Seq(("x", "y")).toDF("a", "b")
        .select(ArrayIntersectSize.intersect_size(col("a"), col("b"))).collect()
    }
    assert(e.getMessage.toLowerCase.contains("array"), e.getMessage)
  }
}
