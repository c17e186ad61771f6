package graft

import org.apache.spark.sql.functions._
import graft.operators.Labeling

/** Golden scenario for the home/work decomposition: a user with a nightly
  * "home" cluster and a weekday "work" cluster, plus a gap to fill.
  */
class LabelingSpec extends SparkSpec {

  // day 0 = 2024-01-01 (a Monday), UTC midnight epoch
  val day0 = 1704067200L
  val p = Labeling.Params(homeWindowDays = 7, workWindowDays = 7,
    minPeriodsFrac = 0.2, workActivityAverageSec = 3600.0) // min_periods = 2

  def mkStays(): org.apache.spark.sql.DataFrame = {
    val rows = (0 until 28).flatMap { i =>
      val d = day0 + i * 86400L
      val isWeekday = ((i % 7) < 5) // day0 is a Monday
      val night =
        if (i == 10) Nil // gap day: no night stay -> must be gap-filled
        else List((7L, 0L, d, d + 22 * 3600, d + 23 * 3600)) // 22:00-23:00 cluster 0
      val work =
        if (isWeekday) List((7L, 1L, d, d + 10 * 3600, d + 16 * 3600)) // 6h cluster 1
        else Nil
      val errand = List((7L, 2L, d, d + 17 * 3600, d + 17 * 3600 + 1800)) // 30min cluster 2 (< threshold)
      night ++ work ++ errand
    }
    import spark.implicits._
    rows.toDF("user_id", "cluster", "day_s", "t0", "t1")
  }

  test("daily home argmax picks the night cluster after warm-up") {
    val home = Labeling.dailyHomeCluster(mkStays(), p)
      .orderBy("day_s").collect()
    assert(home.nonEmpty)
    assert(home.forall(_.getAs[Long]("home_cluster") == 0L))
    // min_periods=2: day 0 has roll_cnt=1 -> excluded
    assert(home.head.getAs[Long]("day_s") == day0 + 86400L)
  }

  test("gap day is nearest-filled with the surrounding home cluster") {
    val filled = Labeling.fillDailyGaps(Labeling.dailyHomeCluster(mkStays(), p))
    val gap = filled.where(col("day_s") === (day0 + 10 * 86400L)).collect()
    assert(gap.length == 1)
    assert(gap.head.getAs[Long]("home_cluster") == 0L)
    assert(gap.head.getAs[Boolean]("filled"))
  }

  test("work cluster crosses the activity threshold; errand does not") {
    val home = Labeling.fillDailyGaps(Labeling.dailyHomeCluster(mkStays(), p))
    val work = Labeling.dailyWorkClusters(mkStays(), home, p).collect()
    assert(work.nonEmpty)
    assert(work.forall(_.getAs[Long]("work_cluster") == 1L)) // never cluster 2
  }

  test("labelStays assigns H/W/O; durations pivot sums per type") {
    val labeled = Labeling.labelStays(mkStays(), p)
    val byType = labeled.groupBy("cluster", "location_type").count()
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(byType.keys.map(_._1).toSet == Set(0L, 1L, 2L))
    // cluster 0 stays are H once labeling warms up; cluster 2 is O
    assert(byType.keys.filter(_._1 == 0L).map(_._2).toSet.contains("H"))
    assert(byType.keys.filter(_._1 == 2L).map(_._2).toSet == Set("O"))

    val dur = Labeling.durations(labeled)
    val row = dur.where(col("day_s") === (day0 + 8 * 86400L)).collect().head
    assert(row.getAs[Long]("H") == 3600L) // the 22:00-23:00 stay
    assert(row.getAs[Long]("W") == 6 * 3600L)
    assert(row.getAs[Long]("O") == 1800L)
  }
}
