package graft

import org.apache.spark.sql.functions._

/** Algorithmic invariants of the round-9 selection operators that the
  * exact-hash oracle cannot express (it pins values, not properties):
  * greedy k-center's max-min radius must be non-increasing, and the
  * Bradley–Terry fit must keep its normalization and win-share
  * consistency.
  */
class SelectionSpec extends SparkSpec {

  val sf = "/root/testdata/sf0.001"

  test("q410 k-center: 10 distinct picks, seed first, selection radius " +
      "non-increasing (the Gonzalez greedy invariant)") {
    val rows = SparkEntry.queries("q410_kcenter_coreset")(spark, sf)
      .orderBy("round").collect()
    assert(rows.length == 10)
    assert(rows.map(_.getLong(1)).distinct.length == 10) // distinct ids
    assert(rows.head.getLong(2) == -1L) // seed carries the -1 sentinel
    val d2s = rows.tail.map(_.getLong(2))
    assert(d2s.forall(_ > 0L), s"degenerate zero radius: ${d2s.toSeq}")
    // farthest-point distances can only shrink as the cover grows
    d2s.sliding(2).foreach { case Array(a, b) =>
      assert(b <= a, s"radius grew: ${d2s.toSeq}")
    }
  }

  test("q406 Bradley-Terry: one strength per source, mean-1e6 " +
      "normalization holds, zero-win sources rank at the bottom") {
    val rows = SparkEntry.queries("q406_bradley_terry")(spark, sf).collect()
    val k = rows.length
    assert(k >= 2)
    val ps = rows.map(_.getLong(2))
    assert(ps.forall(_ >= 1L))
    // last round normalizes by the mean praw: sum stays within k of
    // k * 1e6 (one trunc-div per source)
    val sum = ps.sum
    assert(math.abs(sum - k * 1000000L) <= k * 1000L,
      s"normalization drifted: sum=$sum k=$k")
    // a source with the max win share must not land strictly below one
    // with the min win share (MM preserves this gross ordering)
    val byShare = rows.sortBy(_.getLong(1))
    assert(byShare.last.getLong(2) >= byShare.head.getLong(2))
  }
}
