package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Home/work labeling — native decomposition of the reference's biggest
  * grouped-map UDF, `compute_home_work_label_dynamic`
  * (`gps-analytics/src/wbgps/labeling.py:88-198`, helpers `:12-63`;
  * SURVEY §2.10 F4).
  *
  * The reference runs the whole thing in pandas per user. Here every step
  * that is relational stays declarative (groupBy + time-range window + argmax
  * — partial aggregation, AQE and codegen all apply); only the
  * nearest-gap-fill, which is genuinely sequential per user, uses a tiny
  * `flatMapGroups` over one row per (user, day).
  *
  * Input contract (`stays`): one row per stay-on-a-day with
  *   user_id (any type), cluster (long), day_s (long, UTC midnight epoch),
  *   t0, t1 (long epoch seconds, t1 > t0).
  * Hours are derived with integer arithmetic (t % 86400 div 3600) so results
  * are engine-exact.
  */
object Labeling {

  /** Defaults = the reference's grid-search optimum
    * (`compiled-bookdown/08-optimization.Rmd:262-268`) and production hours.
    */
  case class Params(
      startHourDay: Int = 9,
      endHourDay: Int = 21,
      homeWindowDays: Int = 49,
      workWindowDays: Int = 49,
      minPeriodsFrac: Double = 0.2,
      workActivityAverageSec: Double = 3600.0)

  private def hourOf(c: String) = expr(s"($c % 86400) div 3600")

  /** Night-time stay predicate (`wbgps/labeling.py:92-97`): starts after the
    * evening cutoff or ends before the morning one.
    */
  def isNight(p: Params) =
    hourOf("t0") >= p.endHourDay || hourOf("t1") <= p.startHourDay

  private def minPeriods(windowDays: Int, frac: Double): Int =
    math.ceil(windowDays * frac).toInt

  /** Daily home cluster before gap-filling: per-(user, cluster, day) night
    * duration, `homeWindowDays`-day rolling sum with min_periods emulation
    * (SURVEY W5), then argmax per (user, day) (SURVEY A7).
    */
  def dailyHomeCluster(stays: DataFrame, p: Params = Params()): DataFrame = {
    val nightDaily = stays
      .where(isNight(p))
      .groupBy("user_id", "cluster", "day_s")
      .agg(sum(col("t1") - col("t0")).as("d_night"))
    val roll = Window.partitionBy("user_id", "cluster").orderBy("day_s")
      .rangeBetween(-(p.homeWindowDays - 1).toLong * 86400, 0)
    val pick = Window.partitionBy("user_id", "day_s")
      .orderBy(desc("roll_sum"), asc("cluster"))
    nightDaily
      .withColumn("roll_sum", sum("d_night").over(roll))
      .withColumn("roll_cnt", count(lit(1)).over(roll))
      .where(col("roll_cnt") >= minPeriods(p.homeWindowDays, p.minPeriodsFrac))
      .withColumn("rn", row_number().over(pick))
      .where(col("rn") === 1)
      .select(col("user_id"), col("day_s"), col("cluster").as("home_cluster"),
        col("roll_sum"))
  }

  /** Fill missing days per user with the nearest day's home cluster (ties ->
    * earlier day), the reference's interpolate(nearest)+ffill+bfill
    * (`wbgps/labeling.py:132-148`). Sequential per user -> flatMapGroups
    * over <= one row per day.
    */
  def fillDailyGaps(homeDaily: DataFrame): DataFrame = {
    val spark = homeDaily.sparkSession
    val schema = StructType(Seq(
      StructField("user_id", homeDaily.schema("user_id").dataType),
      StructField("day_s", LongType, nullable = false),
      StructField("home_cluster", LongType, nullable = false),
      StructField("filled", BooleanType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    homeDaily
      .select(col("user_id"), col("day_s").cast("long"),
        col("home_cluster").cast("long"))
      .groupByKey(r => r.get(0))(org.apache.spark.sql.Encoders.kryo[Any])
      .flatMapGroups { (_: Any, it: Iterator[Row]) =>
        val rows = it.toArray.sortBy(_.getLong(1))
        val user = rows.head.get(0)
        val present = rows.map(r => r.getLong(1) -> r.getLong(2))
        val byDay = present.toMap
        val days = present.map(_._1)
        val out = collection.mutable.ArrayBuffer.empty[Row]
        var d = days.head
        var idx = 0 // index of the last present day <= d
        while (d <= days.last) {
          byDay.get(d) match {
            case Some(c) =>
              while (idx < days.length - 1 && days(idx + 1) <= d) idx += 1
              out += Row(user, d, c, false)
            case None =>
              while (idx < days.length - 1 && days(idx + 1) < d) idx += 1
              val prev = days(idx)
              val next = if (idx < days.length - 1) days(idx + 1) else prev
              val nearest = if (d - prev <= next - d) prev else next
              out += Row(user, d, byDay(nearest), true)
          }
          d += 86400
        }
        out.iterator
      }(enc)
  }

  /** Daily work clusters: daytime weekday stays outside the home cluster,
    * rolling mean over `workWindowDays` with min_periods, kept where the
    * mean daily duration >= `workActivityAverageSec`
    * (`wbgps/labeling.py:152-198`).
    */
  def dailyWorkClusters(stays: DataFrame, homeDaily: DataFrame, p: Params = Params()): DataFrame = {
    // Spark dayofweek: 1=Sunday..7=Saturday; weekdays are 2..6
    val dow = dayofweek(timestamp_seconds(col("day_s")))
    val dayDaily = stays
      .where(!isNight(p) && dow.between(2, 6))
      .join(homeDaily.select("user_id", "day_s", "home_cluster"),
        Seq("user_id", "day_s"), "left")
      .where(col("home_cluster").isNull || col("cluster") =!= col("home_cluster"))
      .groupBy("user_id", "cluster", "day_s")
      .agg(sum(col("t1") - col("t0")).as("d_work"))
    val roll = Window.partitionBy("user_id", "cluster").orderBy("day_s")
      .rangeBetween(-(p.workWindowDays - 1).toLong * 86400, 0)
    dayDaily
      .withColumn("roll_avg", avg("d_work").over(roll))
      .withColumn("roll_cnt", count(lit(1)).over(roll))
      .where(col("roll_cnt") >= minPeriods(p.workWindowDays, p.minPeriodsFrac) &&
        col("roll_avg") >= p.workActivityAverageSec)
      .select(col("user_id"), col("day_s"), col("cluster").as("work_cluster"),
        col("roll_avg"))
  }

  /** Label each stay H/W/O (`wbgps/labeling.py:201-207`). */
  def labelStays(stays: DataFrame, p: Params = Params()): DataFrame = {
    val home = fillDailyGaps(dailyHomeCluster(stays, p))
    val work = dailyWorkClusters(stays, home, p)
      .select(col("user_id").as("w_user"), col("day_s").as("w_day"),
        col("work_cluster"))
    stays
      .join(home.select("user_id", "day_s", "home_cluster"), Seq("user_id", "day_s"), "left")
      .join(work,
        col("user_id") === col("w_user") && col("day_s") === col("w_day") &&
          col("cluster") === col("work_cluster"),
        "left")
      .withColumn("location_type",
        when(col("cluster") === col("home_cluster"), "H")
          .when(col("work_cluster").isNotNull, "W")
          .otherwise("O"))
      .drop("w_user", "w_day", "work_cluster")
  }

  /** Grid-search the labeling parameters against a hand-labeled golden
    * set — the reference's optimization methodology
    * (`compiled-bookdown/08-optimization.Rmd:60-216`): each candidate
    * `Params` relabels the stays, is scored by macro-F1 and Cohen's κ
    * against the golden `location_type`, and the argmax is the production
    * parameterization (`08-optimization.Rmd:262-268`). The loop over grid
    * cells is a DRIVER loop by design — the reference's sweep is too, and
    * each cell is one fully distributed labeling run plus one K×K eval
    * reduction (`Eval.macroF1Kappa`); only the 2-scalar score per cell
    * ever reaches the driver, and grids are small (the reference sweeps
    * 6 params over a handful of values each).
    *
    * `golden`: (user_id, cluster, day_s, t0, location_type). Returns one
    * (params, macro_f1_e6, kappa_e6) per grid cell, in input order;
    * kappa is None when undefined (all mass in one truth×pred cell).
    */
  private val sweepKeys = Seq("user_id", "cluster", "day_s", "t0")

  /** Scored (truth, pred) join for one grid cell, with coverage
    * enforcement shared by both sweep forms: every golden row must find
    * its labeled stay — a silently shrunken inner join would score only
    * the intersection, inflating macro-F1 for exactly the params that
    * fail on the dropped stays.
    */
  private def scoredJoin(stays: DataFrame, golden: DataFrame,
      nGolden: Long, p: Params): DataFrame = {
    val g = golden.select(
      sweepKeys.map(col) :+ col("location_type").as("truth"): _*)
    val labeled = labelStays(stays, p)
      .select(sweepKeys.map(col) :+ col("location_type").as("pred"): _*)
    val scored = g.join(labeled, sweepKeys)
    val n = scored.count()
    require(n == nGolden,
      s"sweep: golden rows unmatched by labelStays output for $p " +
        s"(golden=$nGolden, scored=$n); golden must be keyed by " +
        s"(${sweepKeys.mkString(", ")}) of the same stays input")
    scored
  }

  def sweep(stays: DataFrame, golden: DataFrame, grid: Seq[Params])
      : Seq[(Params, Long, Option[Long])] = {
    val nGolden = golden.count()
    require(nGolden > 0, "sweep: golden label set is empty")
    grid.map { p =>
      val r = Eval.macroF1Kappa(
        scoredJoin(stays, golden, nGolden, p), "truth", "pred").collect()(0)
      (p, r.getAs[Long]("macro_f1_e6"),
        if (r.isNullAt(r.fieldIndex("kappa_e6"))) None
        else Some(r.getAs[Long]("kappa_e6")))
    }
  }

  /** The sweep with the reference's bootstrap around each score
    * (`08-optimization.Rmd:262-268` runs the grid AND a balanced bootstrap
    * together): every grid cell is scored per bootstrap fold via
    * `Eval.balancedBootstrap` + `macroF1KappaByFold`, so each candidate
    * gets a macro-F1 DISTRIBUTION, not a point — two params whose fold
    * ranges overlap are statistically indistinguishable on this golden
    * set. Returns (params, per-fold macro_f1_e6 sorted ascending); same
    * driver-loop shape and coverage contract as `sweep`.
    */
  def sweepWithBootstrap(stays: DataFrame, golden: DataFrame,
      grid: Seq[Params], b: Int = 20): Seq[(Params, Seq[Long])] = {
    val nGolden = golden.count()
    require(nGolden > 0, "sweepWithBootstrap: golden label set is empty")
    grid.map { p =>
      // to_json(struct(...)) is injective on the key tuple (JSON escapes
      // any delimiter a string user_id could contain), satisfying
      // balancedBootstrap's unique-id contract
      val scored = scoredJoin(stays, golden, nGolden, p)
        .withColumn("bid", to_json(struct(sweepKeys.map(col): _*)))
      val folds = Eval.macroF1KappaByFold(
        Eval.balancedBootstrap(scored, "bid", b), "fold", "truth", "pred", "m")
        .collect().map(_.getAs[Long]("macro_f1_e6")).toSeq.sorted
      (p, folds)
    }
  }

  /** H/W/O duration pivot per (user, day) — `get_durations`
    * (`wbgps/labeling.py:201-220`, SURVEY A5).
    */
  def durations(labeled: DataFrame): DataFrame =
    labeled
      .groupBy("user_id", "day_s")
      .pivot("location_type", Seq("H", "W", "O"))
      .agg(coalesce(sum(col("t1") - col("t0")), lit(0L)))
      .na.fill(0L, Seq("H", "W", "O"))
}
