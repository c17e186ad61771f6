package graft

import org.apache.spark.sql.functions._
import graft.operators.Mixture

/** Hand-computed fixtures for the training-mix stages.
  *
  * DoReMi rounds (loss 1.0 vs 1.1 in e6 units, η = 0.1, damping):
  *   excess = (0, 100000); w starts (1e6, 1e6).
  *   r1: tw 2e6, share_s1 500000 → exc_t 50000 → w_s1 1005000
  *   r2: tw 2005000, share_s1 501246 → w_s1 1010011
  *   r3: tw 2010011, share_s1 502490 → w_s1 1015035
  *   final shares: s0 496269, s1 503730 (trunc, sum < 1e6 by design)
  */
class MixtureSpec extends SparkSpec {

  test("doremiShares replays the damped multiplicative-weights rounds") {
    val s = spark
    import s.implicits._
    val loss = Seq(("s0", 1000000L), ("s1", 1100000L)).toDF("source", "loss_e6")
    val out = Mixture.doremiShares(loss).orderBy("source").collect()
      .map(r => (r.getString(0), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out.toSeq == Seq(
      ("s0", 0L, 1000000L, 496269L),
      ("s1", 100000L, 1015035L, 503730L)))
  }

  test("uniform loss keeps the mixture uniform") {
    val s = spark
    import s.implicits._
    val loss = Seq(("a", 5L), ("b", 5L), ("c", 5L)).toDF("source", "loss_e6")
    val shares = Mixture.doremiShares(loss).select("share_e6")
      .collect().map(_.getLong(0)).toSet
    assert(shares == Set(333333L))
  }

  test("fillByShare fills each source's budget by priority prefix") {
    val s = spark
    import s.implicits._
    // budgets: a = 60, b = 40 tokens of 100 total
    val shares = Seq(("a", 600000L), ("b", 400000L)).toDF("source", "share_e6")
    val docs = Seq(
      // source a: prio order 1, 2, 3 with 25+25+25 tokens — third breaks 60
      (1L, "a", 25L, 900000L), (2L, "a", 25L, 800000L), (3L, "a", 25L, 700000L),
      // source b: 30+15 — second breaks 40
      (4L, "b", 30L, 900000L), (5L, "b", 15L, 800000L),
      // tie on priority in a: doc 6 beats doc 7 by id... (not selected, over budget)
      (6L, "b", 100L, 100000L)
    ).toDF("doc_id", "source", "n_tok", "prio_e6")
    val out = Mixture.fillByShare(docs, shares, 100L)
      .select("doc_id", "source", "rnk_in_src", "cum_tok")
      .orderBy("source", "rnk_in_src").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq(
      (1L, "a", 1L, 25L), (2L, "a", 2L, 50L),
      (4L, "b", 1L, 30L)))
  }

  test("unimaxAllocation water-fills: caps ascend, prefix capped, rest even") {
    val s = spark
    import s.implicits._
    // caps (2 epochs): a=20, b=40, c=200; budget 90.
    //   a: 20*3=60 <= 90       -> capped, takes 20
    //   b: 40*2=80 <= 90-20=70 fails -> fair
    //   c: monotone, fails too
    //   fair = (90-20) div 2 = 35
    val counts = Seq(("a", 10L), ("b", 20L), ("c", 100L)).toDF("source", "n_tok")
    val out = Mixture.unimaxAllocation(counts, lit(90L), 2L)
      .orderBy("source").collect()
      .map(r => (r.getString(0), r.getLong(3), r.getBoolean(4), r.getLong(5)))
    assert(out.toSeq == Seq(
      ("a", 20L, true, 2000000L),
      ("b", 35L, false, 1750000L),
      ("c", 35L, false, 350000L)))
  }

  test("unimaxAllocation with a slack budget caps every source") {
    val s = spark
    import s.implicits._
    val counts = Seq(("a", 10L), ("b", 20L), ("c", 100L)).toDF("source", "n_tok")
    val out = Mixture.unimaxAllocation(counts, lit(1000L), 2L)
      .orderBy("source").collect()
      .map(r => (r.getString(0), r.getLong(2), r.getLong(3), r.getBoolean(4)))
    assert(out.toSeq == Seq(
      ("a", 20L, 20L, true), ("b", 40L, 40L, true), ("c", 200L, 200L, true)))
  }

  test("assemble gates on quality and respects per-source budgets") {
    val s = spark
    import s.implicits._
    val stop = "the and for" // stopwords so the q53 keep gate passes
    def doc(i: Long, src: String, extra: Int) =
      (i, src, (s"$stop word$i" +: (1 to extra).map(j => s"tok${i}x$j")).mkString(" "))
    val docs = ((1L to 6L).map(i => doc(i, if (i <= 3) "a" else "b", 8)) :+
      (7L, "a", "short")).toDF("doc_id", "source", "text") // doc 7 fails gate (< 10 tokens)
    val out = Mixture.assemble(docs, 40L)
      .select("doc_id", "source", "cum_tok", "src_budget").collect()
    assert(!out.map(_.getLong(0)).contains(7L))
    // every selected row fits its source budget
    assert(out.forall(r => r.getLong(2) <= r.getLong(3)))
    // both sources are represented (near-uniform losses -> near-even split)
    assert(out.map(_.getString(1)).toSet == Set("a", "b"))
    docs.sparkSession.catalog.clearCache()
  }
}
