package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.{GpsPipeline, Labeling, Stops, TimeZones}

/** Mobility-pipeline operators (SURVEY §2.10 F1/F2/F3).
  *
  * The testdata has no GPS pings, so pings are derived deterministically
  * from `events`: each user has a "home" and "work" site ~1.5 km apart,
  * chosen by hour of day, plus a sub-r1 jitter from `value`. Stop detection
  * itself is not SQL-expressible (ordered stateful scan) -> rows-only check
  * here, golden fixtures in StopsSpec.
  */
object Mobility {
  private def t(s: SparkSession, d: String, n: String): DataFrame = Tables(s, d, n)

  /** events -> deterministic pings (user site + jitter). */
  def derivedPings(s: SparkSession, d: String): DataFrame =
    t(s, d, "events").select(
      col("user_id").cast("string").as("user_id"),
      unix_timestamp(col("ts")).as("t"),
      // base site per user; work site is +0.01 deg (~1.1-1.5 km) during
      // office hours; jitter stays well under r1=50 m (0.0002 deg ~ 22 m)
      ((col("user_id") % 80) - 40 +
        when(hour(col("ts")).between(9, 17), 0.01).otherwise(0.0) +
        (col("value") % 0.0002)).as("lat"),
      ((col("user_id") % 160) +
        when(hour(col("ts")).between(9, 17), 0.01).otherwise(0.0) +
        (col("value") % 0.0002)).as("lon"),
      (lit(10.0) + abs(col("value") % 50.0)).as("accuracy"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // F2+F3: stop detection + DBSCAN(min_samples=1) clustering, flatMapGroups.
    // Sparse event times need a wide gap tolerance to form stops.
    "q47_stop_detection" -> ((s, d) => {
      val p = Stops.Params(
        r1Meters = 100.0, minStayingTimeSec = 600, maxTimeBetweenSec = 6 * 86400,
        minSize = 2, maxAccuracyMeters = 100.0, epsMeters = 100.0)
      Stops.detect(derivedPings(s, d), p).toDF()
        .select(col("userId").as("user_id"), col("tStart").as("t_start"),
          col("tEnd").as("t_end"), col("nPings").as("n_pings"),
          col("clusterLabel").as("cluster_label"),
          round(col("lat"), 6).as("lat"), round(col("lon"), 6).as("lon"),
          round(col("medianAccuracy"), 4).as("median_accuracy"))
    }),

    // F1: day-splitter — declarative sequence+explode, oracle-checked.
    "q48_day_split" -> ((s, d) => {
      val iv = t(s, d, "events")
        .select(col("event_id"), unix_timestamp(col("ts")).as("s0"),
          expr("cast(floor(least(abs(value)*36000.0, 259200.0)) as bigint)").as("dur"))
        .where(col("dur") > 0)
        .withColumn("e0", col("s0") + col("dur"))
      Stops.daySplit(iv, "s0", "e0")
        .select(col("event_id"), unix_timestamp(col("day")).as("day_s"),
          col("t0"), col("t1"))
    }),

    // F4 core: night rollup -> 28-day rolling sum w/ min_periods -> daily
    // argmax. All-integer math, oracle-checked.
    "q49_daily_home" -> ((s, d) => {
      Labeling.dailyHomeCluster(derivedStays(s, d), labelParams)
        .select(col("user_id"), col("day_s"), col("home_cluster"), col("roll_sum"))
    }),

    // F4 full pipeline incl. sequential gap-fill + work threshold ->
    // H/W/O label per stay (rows-only: gap-fill isn't SQL-expressible).
    "q50_home_work_label" -> ((s, d) => {
      Labeling.labelStays(derivedStays(s, d), labelParams)
        .select("user_id", "cluster", "day_s", "t0", "t1", "location_type")
    }),

    // A5: H/W/O durations pivot per (user, day) on the labeled stays.
    "q51_durations_pivot" -> ((s, d) => {
      Labeling.durations(Labeling.labelStays(derivedStays(s, d), labelParams))
    }),

    // Tz-offset localization (ref tz_offset.scala:26-37,
    // stop_locations.py:73): broadcast (zone -> offset_sec) dim onto
    // events, shift epochs, derive local hour/day. Offsets include
    // half-hour zones; the dim derives from `nation` (the testdata's
    // country table).
    // The composed 5-stage reference DAG (gps_pipeline.py:43-78) as ONE
    // entry: geocodePings → tzOffset → Stops.detect → geocodeStops →
    // HWlabeling, via GpsPipeline.run. Rows-only here (stop detection is
    // the non-SQL stage); the stage contracts and hand-computed golden
    // labels are spec-gated in GpsPipelineSpec. Admin polygons are four
    // lon-band rectangles covering the derived-ping sites; tz offsets
    // differ per band so localization is load-bearing.
    "q242_gps_pipeline" -> ((s, d) => {
      val admin = Seq(
        ("A0", 0.0, 41.0, 0L), ("A1", 41.0, 81.0, 3600L),
        ("A2", 81.0, 121.0, 7200L), ("A3", 121.0, 161.0, -3600L))
      import s.implicits._
      val adminDf = admin.map { case (id, lo0, lo1, _) =>
        (id, s"POLYGON (($lo0 -41, $lo1 -41, $lo1 41, $lo0 41, $lo0 -41))")
      }.toDF("admin_id", "wkt")
      val offsets = admin.map { case (id, _, _, off) => (id, off) }
        .toDF("admin_id", "offset_sec")
      val cfg = GpsPipeline.Config(
        stops = Stops.Params(r1Meters = 100.0, minStayingTimeSec = 600,
          maxTimeBetweenSec = 6 * 86400, minSize = 2,
          maxAccuracyMeters = 100.0, epsMeters = 100.0),
        labeling = labelParams, gridRes = 6)
      GpsPipeline.run(derivedPings(s, d), adminDf, offsets, cfg)
        .labeledStays
        .select(col("user_id"), col("cluster"), col("day_s"), col("t0"),
          col("t1"), col("admin_id"), col("location_type"))
    }),

    // Origin–destination migration flow matrix — the q70 lag machinery
    // kept at (period, from, to) grain, matching the reference's
    // admin-to-admin flow matrices (gps-analytics/src/analysis/
    // migration_flows.ipynb): per-user monthly home-geom sequence,
    // lag-detect the moves, count by destination month × geom pair.
    // Exact integer counts — no float tail. Scale shape: one keyed
    // window per user plus one (m, from, to) key shuffle.
    "q243_od_flows" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy("m")
      t(s, d, "events")
        .select(col("user_id"),
          ((unix_timestamp(col("ts")) / (30L * 86400)).cast("long")).as("m"))
        .distinct()
        .withColumn("geom", (col("user_id") + col("m")) % 4)
        .withColumn("prev_geom", lag("geom", 1).over(w))
        .where(col("prev_geom").isNotNull && col("prev_geom") =!= col("geom"))
        .groupBy(col("m"), col("prev_geom").as("from_geom"),
          col("geom").as("to_geom"))
        .agg(count(lit(1)).as("n_moves"))
    }),

    "q96_tz_localize" -> ((s, d) => {
      val offsets = t(s, d, "nation").select(
        col("n_nationkey").cast("long").as("zone"),
        (((col("n_nationkey") % 27) - 12) * 3600 +
          (col("n_nationkey") % 2) * 1800).cast("long").as("offset_sec"))
      val facts = t(s, d, "events").select(
        col("event_id"), (col("user_id") % 25).as("zone"),
        unix_timestamp(col("ts")).as("epoch"))
      TimeZones.localize(facts, "zone", "epoch", offsets)
        .select(col("event_id"), col("zone"), col("offset_sec"),
          col("local_epoch"), col("local_hour"), col("local_day_s"))
    }))

  /** Sparse synthetic data needs a tighter window than production hw=49. */
  private val labelParams = Labeling.Params(
    homeWindowDays = 28, workWindowDays = 28, minPeriodsFrac = 0.1,
    workActivityAverageSec = 1800.0)

  /** events -> integer-math stay rows (user, cluster, day, [t0, t1)). */
  def derivedStays(s: SparkSession, d: String): DataFrame =
    t(s, d, "events")
      .select(
        col("user_id"),
        (col("event_id") % 3).as("cluster"),
        unix_timestamp(date_trunc("day", col("ts"))).as("day_s"),
        unix_timestamp(col("ts")).as("t0"),
        expr("cast(floor(least(abs(value)*3600.0, 21600.0)) as bigint)").as("dur"))
      .where(col("dur") > 0)
      .withColumn("t1", col("t0") + col("dur"))
      .drop("dur")

  /** Shared oracle CTE chain replicating `Labeling.labelStays` end to end
    * — including the nearest-day gap fill, which IS SQL-expressible with
    * the q240 ignore-nulls window idiom (scaffold days, last/first
    * non-null neighbor on each side, nearest with ties to the earlier
    * day). Weekday is pure integer arithmetic off the epoch day number
    * (1970-01-01 = Thursday = ISO 4), so no engine timezone is involved.
    * This upgrades q50/q51 from rows-only to fully hash-checked.
    */
  private val labeledCtes: String =
    """stays AS (
         SELECT user_id, event_id % 3 AS cluster,
           CAST(floor(date_part('epoch', date_trunc('day', ts))) AS BIGINT) AS day_s,
           CAST(floor(date_part('epoch', ts)) AS BIGINT) AS t0,
           CAST(floor(date_part('epoch', ts)) AS BIGINT)
             + CAST(floor(least(abs(value)*3600.0, 21600.0)) AS BIGINT) AS t1
         FROM events
         WHERE CAST(floor(least(abs(value)*3600.0, 21600.0)) AS BIGINT) > 0),
       night AS (
         SELECT user_id, cluster, day_s, sum(t1 - t0) AS d_night
         FROM stays
         WHERE (t0 % 86400) // 3600 >= 21 OR (t1 % 86400) // 3600 <= 9
         GROUP BY 1, 2, 3),
       rolled AS (
         SELECT user_id, cluster, day_s,
           sum(d_night) OVER w AS roll_sum, count(*) OVER w AS roll_cnt
         FROM night
         WINDOW w AS (PARTITION BY user_id, cluster ORDER BY day_s
                      RANGE BETWEEN 2332800 PRECEDING AND CURRENT ROW)),
       home0 AS (
         SELECT user_id, day_s, cluster AS home_cluster FROM (
           SELECT user_id, day_s, cluster,
             row_number() OVER (PARTITION BY user_id, day_s
                                ORDER BY roll_sum DESC, cluster ASC) AS rn
           FROM rolled WHERE roll_cnt >= 3) WHERE rn = 1),
       scaffold AS (
         SELECT user_id, unnest(range(mn, mx + 86400, 86400)) AS day_s FROM (
           SELECT user_id, min(day_s) AS mn, max(day_s) AS mx
           FROM home0 GROUP BY 1)),
       fj AS (
         SELECT s.user_id, s.day_s, h.home_cluster
         FROM scaffold s LEFT JOIN home0 h
           ON s.user_id = h.user_id AND s.day_s = h.day_s),
       fw AS (
         SELECT user_id, day_s, home_cluster,
           last_value(home_cluster IGNORE NULLS) OVER back AS c_prev,
           last_value(CASE WHEN home_cluster IS NOT NULL THEN day_s END
             IGNORE NULLS) OVER back AS d_prev,
           first_value(home_cluster IGNORE NULLS) OVER fwd AS c_next,
           first_value(CASE WHEN home_cluster IS NOT NULL THEN day_s END
             IGNORE NULLS) OVER fwd AS d_next
         FROM fj
         WINDOW back AS (PARTITION BY user_id ORDER BY day_s
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         fwd AS (PARTITION BY user_id ORDER BY day_s
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)),
       home AS (
         SELECT user_id, day_s,
           CAST(CASE
             WHEN home_cluster IS NOT NULL THEN home_cluster
             WHEN d_prev IS NULL THEN c_next
             WHEN d_next IS NULL THEN c_prev
             WHEN day_s - d_prev <= d_next - day_s THEN c_prev
             ELSE c_next END AS BIGINT) AS home_cluster
         FROM fw),
       dayw AS (
         SELECT st.user_id, st.cluster, st.day_s,
           sum(st.t1 - st.t0) AS d_work
         FROM stays st LEFT JOIN home h
           ON st.user_id = h.user_id AND st.day_s = h.day_s
         WHERE NOT ((st.t0 % 86400) // 3600 >= 21
                 OR (st.t1 % 86400) // 3600 <= 9)
           AND (((st.day_s // 86400) + 3) % 7) + 1 BETWEEN 1 AND 5
           AND (h.home_cluster IS NULL OR st.cluster <> h.home_cluster)
         GROUP BY 1, 2, 3),
       wrolled AS (
         SELECT user_id, cluster, day_s,
           avg(d_work) OVER w AS roll_avg, count(*) OVER w AS roll_cnt
         FROM dayw
         WINDOW w AS (PARTITION BY user_id, cluster ORDER BY day_s
                      RANGE BETWEEN 2332800 PRECEDING AND CURRENT ROW)),
       work AS (
         SELECT user_id, day_s, cluster AS work_cluster
         FROM wrolled WHERE roll_cnt >= 3 AND roll_avg >= 1800.0),
       labeled AS (
         SELECT st.user_id, st.cluster, st.day_s, st.t0, st.t1,
           CASE WHEN st.cluster = h.home_cluster THEN 'H'
                WHEN w.work_cluster IS NOT NULL THEN 'W'
                ELSE 'O' END AS location_type
         FROM stays st
         LEFT JOIN home h ON st.user_id = h.user_id AND st.day_s = h.day_s
         LEFT JOIN work w ON st.user_id = w.user_id AND st.day_s = w.day_s
           AND st.cluster = w.work_cluster)"""

  val oracles: Map[String, String] = Map(
    "q50_home_work_label" ->
      s"""WITH $labeledCtes
         SELECT user_id, CAST(cluster AS BIGINT) AS cluster, day_s, t0, t1,
           location_type
         FROM labeled""",
    "q51_durations_pivot" ->
      s"""WITH $labeledCtes
         SELECT user_id, day_s,
           CAST(coalesce(sum(CASE WHEN location_type = 'H'
             THEN t1 - t0 END), 0) AS BIGINT) AS "H",
           CAST(coalesce(sum(CASE WHEN location_type = 'W'
             THEN t1 - t0 END), 0) AS BIGINT) AS "W",
           CAST(coalesce(sum(CASE WHEN location_type = 'O'
             THEN t1 - t0 END), 0) AS BIGINT) AS "O"
         FROM labeled GROUP BY 1, 2""",
    "q243_od_flows" ->
      """WITH um AS (
           SELECT DISTINCT user_id,
             CAST(floor(date_part('epoch', ts)) AS BIGINT) // 2592000 AS m
           FROM events),
         g AS (
           SELECT user_id, m, (user_id + m) % 4 AS geom,
             lag((user_id + m) % 4, 1)
               OVER (PARTITION BY user_id ORDER BY m) AS prev_geom
           FROM um)
         SELECT m, prev_geom AS from_geom, geom AS to_geom,
           count(*) AS n_moves
         FROM g WHERE prev_geom IS NOT NULL AND prev_geom <> geom
         GROUP BY 1, 2, 3""",
    "q96_tz_localize" ->
      """WITH off AS (
           SELECT CAST(n_nationkey AS BIGINT) AS zone,
             CAST(((n_nationkey % 27) - 12) * 3600
               + (n_nationkey % 2) * 1800 AS BIGINT) AS offset_sec
           FROM nation),
         ev AS (
           SELECT event_id, CAST(user_id % 25 AS BIGINT) AS zone,
             CAST(floor(date_part('epoch', ts)) AS BIGINT) AS epoch
           FROM events)
         SELECT e.event_id, e.zone, o.offset_sec,
           e.epoch + o.offset_sec AS local_epoch,
           ((((e.epoch + o.offset_sec) % 86400) + 86400) % 86400) // 3600 AS local_hour,
           (e.epoch + o.offset_sec)
             - (((e.epoch + o.offset_sec) % 86400) + 86400) % 86400 AS local_day_s
         FROM ev e JOIN off o USING (zone)""",
    "q48_day_split" ->
      """WITH iv AS (
           SELECT event_id,
             CAST(floor(date_part('epoch', ts)) AS BIGINT) AS s0,
             CAST(floor(date_part('epoch', ts)) AS BIGINT)
               + CAST(floor(least(abs(value)*36000.0, 259200.0)) AS BIGINT) AS e0
           FROM events
           WHERE CAST(floor(least(abs(value)*36000.0, 259200.0)) AS BIGINT) > 0),
         ex AS (
           SELECT event_id, s0, e0,
             CAST(floor(date_part('epoch',
               unnest(generate_series(date_trunc('day', to_timestamp(s0)),
                                      date_trunc('day', to_timestamp(e0)),
                                      INTERVAL 1 DAY)))) AS BIGINT) AS day_s
           FROM iv)
         SELECT event_id, day_s,
           greatest(s0, day_s) AS t0, least(e0, day_s + 86400) AS t1
         FROM ex
         WHERE least(e0, day_s + 86400) > greatest(s0, day_s)""",
    // hw=28 -> RANGE 27*86400=2332800 preceding; min_periods=ceil(28*0.1)=3
    "q49_daily_home" ->
      """WITH stays AS (
           SELECT user_id,
             event_id % 3 AS cluster,
             CAST(floor(date_part('epoch', date_trunc('day', ts))) AS BIGINT) AS day_s,
             CAST(floor(date_part('epoch', ts)) AS BIGINT) AS t0,
             CAST(floor(date_part('epoch', ts)) AS BIGINT)
               + CAST(floor(least(abs(value)*3600.0, 21600.0)) AS BIGINT) AS t1
           FROM events
           WHERE CAST(floor(least(abs(value)*3600.0, 21600.0)) AS BIGINT) > 0),
         night AS (
           SELECT user_id, cluster, day_s, sum(t1 - t0) AS d_night
           FROM stays
           WHERE (t0 % 86400) // 3600 >= 21 OR (t1 % 86400) // 3600 <= 9
           GROUP BY 1,2,3),
         rolled AS (
           SELECT user_id, cluster, day_s,
             sum(d_night) OVER w AS roll_sum, count(*) OVER w AS roll_cnt
           FROM night
           WINDOW w AS (PARTITION BY user_id, cluster ORDER BY day_s
                        RANGE BETWEEN 2332800 PRECEDING AND CURRENT ROW)),
         picked AS (
           SELECT user_id, day_s, cluster, roll_sum,
             row_number() OVER (PARTITION BY user_id, day_s
                                ORDER BY roll_sum DESC, cluster ASC) AS rn
           FROM rolled WHERE roll_cnt >= 3)
         SELECT user_id, day_s, CAST(cluster AS BIGINT) AS home_cluster,
           CAST(roll_sum AS BIGINT) AS roll_sum
         FROM picked WHERE rn = 1""")
}
