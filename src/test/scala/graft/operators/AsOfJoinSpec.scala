package graft.operators

import graft.SparkSpec

class AsOfJoinSpec extends SparkSpec {

  test("asof join picks latest right row at-or-before each left ts") {
    import spark.implicits._
    val left = Seq(
      (1L, "u1", 100L), (2L, "u1", 250L), (3L, "u1", 50L), (4L, "u2", 500L))
      .toDF("event_id", "key", "t")
    val right = Seq(
      ("u1", 100L, "state_a"), ("u1", 200L, "state_b"), ("u3", 10L, "other"))
      .toDF("key", "rt", "state")
    val got = AsOfJoin.asofJoin(left, right, "key", "t", "rt", Seq("state"))
      .orderBy("event_id").collect()
      .map(r => r.getAs[Long]("event_id") -> r.getAs[String]("state")).toMap
    assert(got(1L) == "state_a")  // equal ts counts (<= semantics)
    assert(got(2L) == "state_b")  // latest preceding state wins
    assert(got(3L) == null)       // no right row at or before t=50
    assert(got(4L) == null)       // key with no right rows at all
  }

  test("left rows and columns are fully preserved") {
    import spark.implicits._
    val left = Seq((1L, "u1", 100L, "payload")).toDF("id", "key", "t", "extra")
    val right = Seq(("u1", 90L, 7.5)).toDF("key", "rt", "price")
    val got = AsOfJoin.asofJoin(left, right, "key", "t", "rt", Seq("price"))
    assert(got.columns.toSet == Set("id", "key", "t", "extra", "price"))
    val row = got.collect().head
    assert(row.getAs[String]("extra") == "payload")
    assert(row.getAs[Double]("price") == 7.5)
  }
}
