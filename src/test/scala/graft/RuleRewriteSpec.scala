package graft

import org.apache.spark.sql.functions._

class RuleRewriteSpec extends SparkSpec {
  init()

  import spark.implicits._

  test("size(array_intersect) fuses to intersect_size for non-null-element arrays") {
    // parquet-backed (literal fixtures constant-fold to a LocalRelation
    // before the plan can be inspected)
    val docs = spark.read.parquet(s"$sfSmoke/documents.parquet")
      .select(
        split(col("text"), " ").as("a"),
        split(reverse(col("text")), " ").as("b"))
    val q = docs.select(expr("size(array_intersect(a, b))").as("n"))
    val plan = q.queryExecution.optimizedPlan.toString
    assert(
      plan.contains("intersect_size") || plan.contains("ArrayIntersectSize"),
      s"rule must fuse the pattern:\n$plan")
    // and the tiny literal case still computes correctly through the rule
    val vals = Seq(("a b c d", "c d e"), ("x", "y")).toDF("s1", "s2")
      .select(split(col("s1"), " ").as("a"), split(col("s2"), " ").as("b"))
      .select(expr("size(array_intersect(a, b))").as("n"))
    assert(vals.as[Int].collect().toSeq == Seq(2, 0))
  }

  test("nullable-element arrays are NOT rewritten (array_intersect keeps shared nulls)") {
    val df = spark.sql(
      "SELECT array('a', CAST(NULL AS STRING)) AS a, array(CAST(NULL AS STRING), 'b') AS b")
    val q = df.select(expr("size(array_intersect(a, b))").as("n"))
    val plan = q.queryExecution.optimizedPlan.toString
    assert(
      !plan.contains("intersect_size") && !plan.contains("ArrayIntersectSize"),
      s"nullable elements must stay on array_intersect:\n$plan")
    assert(q.as[Int].head() == 1) // the shared null survives array_intersect
  }

  test("null ARRAY inputs keep size()'s semantics through the rewrite") {
    val df = Seq((Seq("a", "b"), Option(Seq("b", "c"))), (Seq("a"), None))
      .toDF("a", "b")
      .select(col("a"), col("b").cast("array<string>").as("b"))
    val got = df.selectExpr("size(array_intersect(a, b)) AS n")
      .as[Option[Int]].collect().toSeq
    assert(got == Seq(Some(1), None))
  }

  test("the q18 verify kernel and the rewritten plain form agree on the corpus") {
    val docs = spark.read.parquet(s"$sfSmoke/documents.parquet")
    val toks = graft.operators.SimilarityJoin.tokenize(docs, "doc_id", "text")
    val a = toks.select(col("sid").as("k"), col("toks").as("ta"))
    val b = toks.select((col("sid") - 1).as("k"), col("toks").as("tb"))
    val j = a.join(b, "k")
    val plain = j.selectExpr("k", "size(array_intersect(ta, tb)) AS n")
    val fused = j.selectExpr("k", "intersect_size(ta, tb) AS n")
    assert(plain.exceptAll(fused).isEmpty && fused.exceptAll(plain).isEmpty)
  }
}
