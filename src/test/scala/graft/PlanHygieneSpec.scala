package graft

/** Scale-guard over the WHOLE query surface: no query may plan a
  * CartesianProduct (the one all-pairs scan that cannot survive 100 TB).
  * q22 is the sanctioned exception — its broadcast nested-loop against a
  * 10-row query set IS the brute-force ANN baseline's contract.
  *
  * Queries that execute streaming work at construction time still return a
  * final DataFrame whose plan gets the same check.
  */
class PlanHygieneSpec extends SparkSpec {
  init()

  test("no query plans a cartesian product at sf0.001") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val plan = fn(spark, sfSmoke).queryExecution.executedPlan.toString
      if (plan.contains("CartesianProduct")) Some(name) else None
    }
    assert(offenders.isEmpty, s"cartesian products in: $offenders")
  }
}
