package graft

import graft.operators.Forget

class ForgetSpec extends SparkSpec {
  init()
  import spark.implicits._

  private def subjects = Seq(2L, 4L, 99L).toDF("uid") // 99 hits nothing
  private def users = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")).toDF("uid", "name")
  private def posts = Seq((10L, 1L), (11L, 2L), (12L, 2L), (13L, 3L)).toDF("post_id", "uid")

  test("audit counts per table; absent subjects remove nothing") {
    val got = Forget.audit(subjects, "uid",
        Seq(("users", users, "uid"), ("posts", posts, "uid")))
      .orderBy("table").as[(String, Long, Long, Long)].collect().toSeq
    assert(got == Seq(("posts", 4L, 2L, 2L), ("users", 4L, 2L, 2L)))
  }

  test("scrub removes exactly the doomed rows; audit agrees") {
    val left = Forget.scrub(subjects, "uid", posts, "uid")
      .select("post_id").as[Long].collect().toSeq.sorted
    assert(left == Seq(10L, 13L))
  }

  test("duplicate subject rows do not double-count removals") {
    val got = Forget.audit(subjects.union(subjects), "uid",
        Seq(("users", users, "uid")))
      .as[(String, Long, Long, Long)].head()
    assert(got == (("users", 4L, 2L, 2L)))
  }

  test("two-hop cascade: doomed parents feed the child scrub") {
    val orders = Seq((100L, 2L), (101L, 1L), (102L, 4L)).toDF("order_id", "uid")
    val items = Seq((1000L, 100L), (1001L, 101L), (1002L, 102L), (1003L, 102L))
      .toDF("item_id", "order_id")
    val doomedOrders = orders.join(
      subjects.select(org.apache.spark.sql.functions.col("uid")), Seq("uid"), "left_semi")
    val got = Forget.audit(doomedOrders, "order_id", Seq(("items", items, "order_id")))
      .as[(String, Long, Long, Long)].head()
    assert(got == (("items", 4L, 3L, 1L)))
  }
}
