package graft

import org.apache.spark.sql.functions._

import graft.functions.JavaStringHash

class JavaStringHashSpec extends SparkSpec {
  init()

  test("java_hash equals String.hashCode, including null and unicode") {
    import spark.implicits._
    JavaStringHash.register(spark)
    val inputs = Seq("", "abc", "the quick brown fox", "café", "a" * 500, null)
    val df = inputs.toDF("s")
      .select(col("s"), JavaStringHash.java_hash(col("s")).as("h"))
    val got = df.collect()
    inputs.zip(got).foreach { case (in, row) =>
      if (in == null) assert(row.isNullAt(1), "null must hash to null")
      else assert(row.getInt(1) == in.hashCode, s"'$in'")
    }
  }

  test("java_hash is usable from SQL and participates in whole-stage codegen") {
    JavaStringHash.register(spark)
    // a real datasource scan — a 2-row local relation would be folded into
    // a LocalTableScan before any codegen happens
    graft.core.Tables(spark, sfSmoke, "documents").createOrReplaceTempView("jh_docs")
    val df = spark.sql("SELECT doc_id, java_hash(text) AS h FROM jh_docs")
    val sample = df.orderBy("doc_id").limit(1).collect()(0)
    val expected = graft.core.Tables(spark, sfSmoke, "documents")
      .orderBy("doc_id").limit(1).collect()(0).getAs[String]("text").hashCode
    assert(sample.getInt(1) == expected)
    // the projection must sit inside a WholeStageCodegen span (the `*(n)`
    // stage) — the whole point of doGenCode over a UDF
    val inCodegen = df.queryExecution.executedPlan
      .find(_.isInstanceOf[org.apache.spark.sql.execution.WholeStageCodegenExec])
      .isDefined
    assert(inCodegen, df.queryExecution.executedPlan.toString)
  }

  test("extensions install java_hash globally: fresh sessions resolve it unregistered") {
    // the spec session is built with spark.sql.extensions=graft
    // .GraftExtensions (SparkSpec) — exactly the production install path —
    // so a NEW session state must resolve java_hash with no per-session
    // registration (temp registration alone would not survive newSession)
    val fresh = spark.newSession()
    val got = fresh.sql("SELECT java_hash('x') AS h").collect()(0).getInt(0)
    assert(got == "x".hashCode)
  }

  test("java_hash rejects non-string input at analysis time") {
    JavaStringHash.register(spark)
    import spark.implicits._
    val e = intercept[Exception] {
      Seq(1).toDF("n").select(JavaStringHash.java_hash(col("n"))).collect()
    }
    assert(e.getMessage.toLowerCase.contains("string"), e.getMessage)
  }
}
