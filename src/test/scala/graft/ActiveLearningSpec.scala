package graft

import org.apache.spark.sql.functions._
import graft.operators.ActiveLearning

/** Param-recovery spec for the active-learning loop (the Labeling.sweep
  * pattern): a planted decision boundary must be recovered from few
  * labels, and the uncertainty strategy must prefer the informative
  * band — beating pure random exploration at equal label budget.
  *
  * Fixture: 2000 items, score_e6 = 1000·i (a dense grid), planted truth
  * y = 1{score ≥ 700_000}. The loop starts believing the threshold is
  * 500_000. Labels are noiseless, so labeled accuracy is maximized
  * exactly at the planted cut once any straddling pair is labeled.
  */
class ActiveLearningSpec extends SparkSpec {

  private val PlantedE6 = 700000L

  private def fixtures = {
    val s = spark
    import s.implicits._
    val pool = (0 until 2000)
      .map(i => (i.toLong, i.toLong * 1000L)).toDF("id", "score_e6")
    val oracle = (0 until 2000)
      .map(i => (i.toLong, if (i * 1000L >= PlantedE6) 1L else 0L))
      .toDF("id", "label")
    (pool, oracle)
  }

  test("select: strategies are disjoint slices with the right shapes") {
    val s = spark
    import s.implicits._
    val (pool, _) = fixtures
    val labeled = Seq(5L, 6L).toDF("id")
    val cfg = ActiveLearning.Config(kExploit = 10, kUncertain = 10,
      kExplore = 10)
    val picked = ActiveLearning.select(pool, labeled, cfg, 500000L)
    val byStrategy = picked.groupBy("strategy").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // uncertainty = 10 above + 10 below
    assert(byStrategy == Map("exploit" -> 10L, "uncertain" -> 20L,
      "explore" -> 10L))
    // already-labeled ids never reappear
    assert(picked.where(col("id").isin(5L, 6L)).count() == 0)
    // exploitation is exactly the global top-k
    val topIds = picked.where(col("strategy") === "exploit")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(topIds == (1990L until 2000L).toSet)
    // uncertainty brackets the current threshold (scores 490k..509k)
    val uncIds = picked.where(col("strategy") === "uncertain")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(uncIds == (490L until 510L).toSet)
  }

  test("uncertainty loop recovers the planted threshold from a near prior") {
    val (pool, oracle) = fixtures
    // prior 20k off; the ±25-example band straddles the true cut, so the
    // noiseless refit lands EXACTLY on it in iteration 1 and stays
    val stats = ActiveLearning.iterate(pool, oracle,
      ActiveLearning.Config(kUncertain = 25, iterations = 2,
        initialThresholdE6 = 680000L))
    assert(stats.head.thresholdE6 == PlantedE6, stats.toString)
    assert(stats.last.thresholdE6 == PlantedE6, stats.toString)
    assert(stats.last.poolAccuracyE6 == 1000000L, stats.toString)
  }

  test("uncertainty beats random exploration at equal budget, near prior") {
    val (pool, oracle) = fixtures
    val unc = ActiveLearning.iterate(pool, oracle,
      ActiveLearning.Config(kUncertain = 25, iterations = 2,
        initialThresholdE6 = 680000L))
    val rnd = ActiveLearning.iterate(pool, oracle,
      ActiveLearning.Config(kUncertain = 0, kExplore = 50, iterations = 2,
        initialThresholdE6 = 680000L))
    // same budget per iteration (50 labels); the informative band wins
    assert(unc.last.nLabeled == rnd.last.nLabeled,
      s"budget mismatch: $unc vs $rnd")
    assert(unc.last.poolAccuracyE6 > rnd.last.poolAccuracyE6,
      s"uncertainty $unc not better than random $rnd")
  }

  test("exploration rescues a far-off prior that pure uncertainty creeps on") {
    val (pool, oracle) = fixtures
    // prior 200k off: the uncertainty band (±25 examples = ±25k score)
    // can only creep toward the cut — the reference runs exploration
    // ALONGSIDE uncertainty precisely for this regime; the mixed budget
    // finds straddling labels at iteration 1 and then refines
    val pure = ActiveLearning.iterate(pool, oracle,
      ActiveLearning.Config(kUncertain = 25, iterations = 3,
        initialThresholdE6 = 500000L))
    val mixed = ActiveLearning.iterate(pool, oracle,
      ActiveLearning.Config(kUncertain = 13, kExplore = 24, iterations = 3,
        initialThresholdE6 = 500000L))
    // an example picked by two strategies in one iteration costs ONE
    // label (select → distinct), so mixed can come in slightly under
    assert(mixed.last.nLabeled <= pure.last.nLabeled,
      s"budget exceeded: $pure vs $mixed")
    def err(t: Long) = math.abs(t - PlantedE6)
    assert(err(mixed.last.thresholdE6) < err(pure.last.thresholdE6),
      s"mixed $mixed not closer than pure $pure")
    assert(mixed.last.poolAccuracyE6 > pure.last.poolAccuracyE6,
      s"mixed $mixed not better than pure $pure")
  }
}
