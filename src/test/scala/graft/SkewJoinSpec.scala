package graft

import org.apache.spark.sql.functions._
import graft.operators.SkewJoin

/** Salted-join equivalence: both variants must return exactly the plain
  * inner join's multiset, including on duplicate-heavy hot keys — the case
  * the collapse-dupes variant exists for.
  */
class SkewJoinSpec extends SparkSpec {

  // hot key 1 with many rows (some byte-identical), cold keys 2..4
  private def big() = {
    import spark.implicits._
    (Seq.fill(40)((1L, "dup-payload")) ++
      (1 to 20).map(i => (1L, s"p$i")) ++
      (2L to 4L).map(k => (k, s"cold$k"))).toDF("k", "v")
  }

  private def rep() = {
    import spark.implicits._
    Seq((1L, "one"), (2L, "two"), (3L, "three"), (9L, "unmatched"))
      .toDF("k", "name")
  }

  private def assertSameMultiset(a: org.apache.spark.sql.DataFrame,
                                 b: org.apache.spark.sql.DataFrame): Unit = {
    assert(a.count() == b.count())
    assert(a.exceptAll(b).count() == 0L)
    assert(b.exceptAll(a).count() == 0L)
  }

  test("saltedJoin equals plain inner join") {
    val plain = big().join(rep(), Seq("k"))
    assertSameMultiset(SkewJoin.saltedJoin(big(), rep(), "k", 4), plain)
  }

  test("saltedJoinCollapseDupes equals plain inner join on duplicate-heavy keys") {
    val plain = big().join(rep(), Seq("k"))
    assertSameMultiset(SkewJoin.saltedJoinCollapseDupes(big(), rep(), "k", 4), plain)
  }

  test("hotKeySplitJoin equals plain inner join; hotKeys finds the hot key") {
    val plain = big().join(rep(), Seq("k"))
    val hot = SkewJoin.hotKeys(big(), "k", 10L)
    assert(hot == Seq(1L), hot)
    assertSameMultiset(SkewJoin.hotKeySplitJoin(big(), rep(), "k", hot), plain)
    // the hot slice rides a broadcast join — no shuffle of the hot rows
    val p = SkewJoin.hotKeySplitJoin(big(), rep(), "k", hot)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("hotKeySplitJoin with an empty hot list degrades to the plain join") {
    val plain = big().join(rep(), Seq("k"))
    assertSameMultiset(
      SkewJoin.hotKeySplitJoin(big(), rep(), "k", Seq(5L)), plain)
  }

  test("collapse variant re-inflates duplicates after the join (map-side generator)") {
    val out = SkewJoin.saltedJoinCollapseDupes(big(), rep(), "k", 4)
    // the 40 byte-identical hot rows must come back 40 times
    assert(out.where(col("v") === "dup-payload").count() == 40L)
    // and the generator sits ABOVE the join in the physical plan — the
    // duplicates never travel through a shuffle
    val p = out.queryExecution.executedPlan.toString
    assert(p.contains("Generate"), p)
  }
}
