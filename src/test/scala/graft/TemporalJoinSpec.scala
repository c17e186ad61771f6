package graft

import graft.operators.TemporalJoin

class TemporalJoinSpec extends SparkSpec {

  test("asOf: equal timestamps match; nothing-before yields null; latest tie wins") {
    import spark.implicits._
    val clicks = Seq((1L, 100L, 10L), (1L, 50L, 11L), (2L, 100L, 20L))
      .toDF("user", "t", "click_id")
    val purchases = Seq(
      (1L, 100L, 1L, 111L), // equal t -> matches click at t=100
      (1L, 100L, 2L, 222L), // same t, higher tie id -> wins
      (1L, 60L, 3L, 333L))
      .toDF("user", "t", "pid", "v")
    val out = TemporalJoin.asOf(clicks, purchases, "user", "t", "pid", "v")
      .select("click_id", "asof_value").as[(Long, Option[Long])].collect().toMap
    assert(out(10L).contains(222L)) // equal-t purchases visible, latest pid wins
    assert(out(11L).isEmpty) // nothing at or before t=50
    assert(out(20L).isEmpty) // other user's purchases invisible
  }

  test("rangePairs: boundary inclusive, cross-bucket pairs found, each once") {
    import spark.implicits._
    val ev = Seq(
      (1L, 0L, 1L), (1L, 600L, 2L), // exactly window apart -> pair
      (1L, 601L, 3L), // 601 from id1 -> no pair with 1; 1 from id2 -> pair
      (1L, 5000L, 4L), // far from everything
      (2L, 10L, 5L), (2L, 11L, 6L)) // other key
      .toDF("user", "t", "id")
    val pairs = TemporalJoin.rangePairs(ev, "user", "t", "id", 600L)
      .select("ia", "ib").as[(Long, Long)].collect().toSeq
    assert(pairs.size == pairs.distinct.size) // exactly-once
    assert(pairs.toSet == Set((1L, 2L), (2L, 3L), (5L, 6L)))
  }
}
