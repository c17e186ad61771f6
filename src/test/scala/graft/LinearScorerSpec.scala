package graft

import org.apache.spark.sql.functions._
import graft.operators.LinearScorer

/** Plant known weights and documents, recover the exact logits and
  * predictions of the regex-feature logistic scorer (the reference's
  * lr_prediction.py expansion shape).
  */
class LinearScorerSpec extends SparkSpec {

  private val regexes = Seq("ab+c", "^start")
  private val ngrams = Seq("needle")

  test("planted weights give exact integer logits and the >0.5 cut") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "xx abbbc yy"),           // hits regex 1 only  -> x = (1,0,0)
      (2L, "start of it, a needle"), // hits regex 2 + ngram -> (0,1,1)
      (3L, "nothing here"),          // -> (0,0,0)
      (4L, "start abc needle")       // all three -> (1,1,1)
    ).toDF("doc_id", "text")
    val models = Seq(
      (0L, Seq(400000L, 300000L, 200000L), -350000L), // "w·x > 0.35"
      (1L, Seq(-100000L, 500000L, -200000L), 0L)
    ).toDF("model_id", "w_e6", "b_e6")
    val out = LinearScorer.score(docs, col("text"), regexes, ngrams,
        models, col("doc_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    assert(out((1L, 0L)) == (50000L, 1L))    // 0.4 - 0.35
    assert(out((1L, 1L)) == (-100000L, 0L))
    assert(out((2L, 0L)) == (150000L, 1L))   // 0.3 + 0.2 - 0.35
    assert(out((2L, 1L)) == (300000L, 1L))
    assert(out((3L, 0L)) == (-350000L, 0L))  // bias only
    assert(out((3L, 1L)) == (0L, 0L))        // logit 0 -> p = 0.5, not > 0.5
    assert(out((4L, 0L)) == (550000L, 1L))
    assert(out((4L, 1L)) == (200000L, 1L))
  }

  test("scoring is map-only over a broadcast model dim — no shuffle") {
    val s = spark
    import s.implicits._
    val docs = Seq((1L, "abc")).toDF("doc_id", "text")
    val models = Seq((0L, Seq(1L, 2L, 3L), 0L)).toDF("model_id", "w_e6", "b_e6")
    val plan = LinearScorer.score(docs, col("text"), regexes, ngrams,
      models, col("doc_id")).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }
}
