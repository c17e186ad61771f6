package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Active-learning loop — the composed driver for the reference's
  * `5-active_learning/` stage (the way `Labeling.sweep` composes the
  * grid-search): per iteration, SELECT examples to label from a scored
  * pool by the reference's three strategies, reveal their labels, refit
  * the decision threshold on everything labeled so far, and report
  * pool-level quality.
  *
  * Strategies (one per reference sub-directory):
  *  - exploitation: top-k by model score
  *    (`exploitation/sample_top_tweets.py`, `adaptive_retrieval/
  *    retrieve_top_tweets.py` — "top tweets in terms of base rate");
  *  - uncertainty: k closest above + k closest below the current
  *    decision threshold (`uncertainty_sampling/
  *    retrieve_tweets_around_threshold.py:154-155`, the q74 operator);
  *  - exploration: k content-hash-pseudorandom examples
  *    (`exploration/score_random_tweets.py` — scored random draws; the
  *    hash makes the draw engine-replayable, SURVEY §7.3's seeding rule).
  * Every strategy discards already-labeled ids first
  * (`discard_already_labelled_tweets`, an anti join).
  *
  * The refit is the 1-D exact threshold optimizer: candidate cuts are the
  * labeled scores, each scored by labeled accuracy via one cumulative
  * window over the (small) labeled set — argmax, ties to the LOWEST
  * score. This stands in for the reference's per-iteration model retrain
  * (ONNX BERT, out of engine scope — the F10 divergence), keeping the
  * loop's signal path (select → label → refit → re-rank) fully in-engine.
  *
  * Scale shape: the pool is touched once per iteration by rank-k cuts
  * (TakeOrdered, no full sort materialization) and one final accuracy
  * aggregate; the labeled set (human-budget-sized, like the reference's
  * hand-label batches) carries the windows. The iteration loop is a
  * DRIVER loop by design — the reference runs one sbatch per iteration.
  */
object ActiveLearning {

  case class Config(
      kExploit: Int = 0,
      kUncertain: Int = 25,
      kExplore: Int = 0,
      iterations: Int = 3,
      initialThresholdE6: Long = 500000L)

  case class IterStat(
      iteration: Int,
      nLabeled: Long,
      thresholdE6: Long,
      poolAccuracyE6: Long)

  /** One selection step over `pool` (id, score_e6), minus `labeled` (id).
    * Returns (id, score_e6, strategy) — a row per selected example; an
    * example picked by two strategies appears once per strategy, like the
    * reference's per-strategy label sheets.
    */
  def select(pool: DataFrame, labeled: DataFrame, cfg: Config,
      thresholdE6: Long): DataFrame = {
    val cand = pool.join(labeled.select(col("id")), Seq("id"), "left_anti")
    val exploit = cand
      .orderBy(desc("score_e6"), asc("id")).limit(cfg.kExploit)
      .withColumn("strategy", lit("exploit"))
    val above = cand.where(col("score_e6") >= thresholdE6)
      .orderBy(asc("score_e6"), asc("id")).limit(cfg.kUncertain)
    val below = cand.where(col("score_e6") < thresholdE6)
      .orderBy(desc("score_e6"), asc("id")).limit(cfg.kUncertain)
    val uncertain = above.union(below).withColumn("strategy", lit("uncertain"))
    val explore = cand
      .orderBy(graft.functions.TextFunctions
        .hash60(col("id").cast("string")).asc, col("id").asc)
      .limit(cfg.kExplore)
      .withColumn("strategy", lit("explore"))
    exploit.union(uncertain).union(explore)
  }

  /** Exact 1-D threshold refit on the labeled set (id, score_e6, label):
    * pick the labeled score t maximizing
    *   #(label=1 ∧ score ≥ t) + #(label=0 ∧ score < t),
    * ties to the lowest t. One sort window over the labeled rows.
    */
  def refitThreshold(labeledEx: DataFrame): DataFrame = {
    val n1 = Window.partitionBy(lit(1))
    val byScore = Window.partitionBy(lit(1)).orderBy(asc("score_e6"), asc("id"))
    // at cut t = score of row r: positives at/after r + negatives before r
    labeledEx
      .withColumn("neg_before",
        sum(when(col("label") === 0L, 1L).otherwise(0L)).over(
          byScore.rowsBetween(Window.unboundedPreceding, -1)))
      // pos_from = total positives − positives strictly before: keeps
      // both passes on RUNNING frames (a currentRow→unboundedFollowing
      // frame is recomputed per row in WindowExec — the q311 O(n²)
      // lesson), same value by complement
      .withColumn("pos_from",
        sum(when(col("label") === 1L, 1L).otherwise(0L)).over(n1) -
          coalesce(sum(when(col("label") === 1L, 1L).otherwise(0L)).over(
            byScore.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("correct",
        coalesce(col("neg_before"), lit(0L)) + col("pos_from"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(lit(1))
          .orderBy(desc("correct"), asc("score_e6"), asc("id"))))
      .where(col("rn") === 1)
      .select(col("score_e6").as("threshold_e6"), col("correct"))
  }

  /** The loop. `pool`: (id, score_e6); `oracle`: (id, label) — the
    * ground truth revealed only for selected ids (the human labeler).
    * Returns one IterStat per iteration; thresholds and accuracies are
    * exact integers.
    */
  def iterate(pool: DataFrame, oracle: DataFrame, cfg: Config): Seq[IterStat] = {
    val spark = pool.sparkSession
    import spark.implicits._
    var labeled = spark.emptyDataset[(Long, Long, Long)]
      .toDF("id", "score_e6", "label")
    var threshold = cfg.initialThresholdE6
    val poolN = pool.count()
    (1 to cfg.iterations).map { it =>
      val picked = select(pool, labeled, cfg, threshold)
        .select(col("id"), col("score_e6")).distinct()
      val newlyLabeled = picked.join(oracle, Seq("id"))
        .select(col("id"), col("score_e6"), col("label"))
      labeled = labeled.unionByName(newlyLabeled)
        .groupBy("id").agg(first("score_e6").as("score_e6"),
          first("label").as("label"))
        .localCheckpoint() // cut the per-iteration lineage growth
      threshold = refitThreshold(labeled)
        .collect()(0).getAs[Long]("threshold_e6")
      val acc = pool.join(oracle, Seq("id"))
        .agg(sum(when(
          (col("score_e6") >= threshold && col("label") === 1L) ||
            (col("score_e6") < threshold && col("label") === 0L),
          1L).otherwise(0L)).as("ok"))
        .collect()(0).getAs[Long]("ok")
      IterStat(it, labeled.count(), threshold, acc * 1000000L / poolN)
    }
  }
}
