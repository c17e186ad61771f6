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
    // F2+F3: stop detection + DBSCAN(min_samples=1) clustering,
    // flatMapGroups. Sparse event times need a wide gap tolerance to form
    // stops. HASH-CHECKED against a recursive-CTE sequential replay (the
    // oracle walks each user's pings in the same order, carrying the same
    // running centroid state, then closes the single-linkage components
    // to fixpoint) — the centroid in the output is the SEQUENTIAL
    // time-order sum both sides accumulate, so the doubles are
    // bit-identical, and outputs are floored micro-units. The haversine
    // thresholds (r1=100 m, eps=100 m) sit >= 55 m from every distance
    // the derived pings produce, so libm trig differences (~1e-10
    // relative) cannot flip a membership decision.
    "q47_stop_detection" -> ((s, d) => {
      val p = Stops.Params(
        r1Meters = 100.0, minStayingTimeSec = 600, maxTimeBetweenSec = 6 * 86400,
        minSize = 2, maxAccuracyMeters = 100.0, epsMeters = 100.0)
      Stops.detect(derivedPings(s, d), p).toDF()
        .select(col("userId").as("user_id"), col("tStart").as("t_start"),
          col("tEnd").as("t_end"), col("nPings").cast("long").as("n_pings"),
          col("clusterLabel").cast("long").as("cluster_label"),
          floor(col("lat") * 1e6).cast("long").as("lat_e6"),
          floor(col("lon") * 1e6).cast("long").as("lon_e6"),
          floor(col("medianAccuracy") * 1e4).cast("long").as("acc_e4"))
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
    // HWlabeling, via GpsPipeline.run — HASH-CHECKED end to end: the
    // oracle replays geocode as a band comparison (edge-free polygon
    // placement), localization as an epoch shift, stop detection as the
    // q47 recursive walk, and labeling as the q50 chain. Hand-computed
    // golden labels are additionally spec-gated in GpsPipelineSpec.
    // Admin polygons are four lon-band rectangles covering the
    // derived-ping sites; tz offsets differ per band so localization is
    // load-bearing.
    "q242_gps_pipeline" -> ((s, d) => {
      // Band edges at x.0035: derived-ping lon fractional parts live in
      // [0, 0.0002) ∪ [0.01, 0.0102), so NO ping can sit on a polygon
      // boundary — geocode assignment is uniquely a band comparison,
      // which is what lets the oracle replay it as a CASE and makes the
      // whole composed DAG hash-checkable.
      val admin = Seq(
        ("A0", -0.0005, 41.0035, 0L), ("A1", 41.0035, 81.0035, 3600L),
        ("A2", 81.0035, 121.0035, 7200L), ("A3", 121.0035, 161.0035, -3600L))
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
  private val eventStaysSql: String =
    """SELECT user_id, event_id % 3 AS cluster,
         CAST(floor(date_part('epoch', date_trunc('day', ts))) AS BIGINT) AS day_s,
         CAST(floor(date_part('epoch', ts)) AS BIGINT) AS t0,
         CAST(floor(date_part('epoch', ts)) AS BIGINT)
           + CAST(floor(least(abs(value)*3600.0, 21600.0)) AS BIGINT) AS t1
       FROM events
       WHERE CAST(floor(least(abs(value)*3600.0, 21600.0)) AS BIGINT) > 0"""

  /** Label chain over a predefined CTE `stays` (user_id, cluster, day_s,
    * t0, t1, extra columns carried through to `labeled`).
    */
  private val labelChain: String =
    """night AS (
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
           avg(d_work) OVER w2 AS roll_avg, count(*) OVER w2 AS roll_cnt
         FROM dayw
         WINDOW w2 AS (PARTITION BY user_id, cluster ORDER BY day_s
                       RANGE BETWEEN 2332800 PRECEDING AND CURRENT ROW)),
       work AS (
         SELECT user_id, day_s, cluster AS work_cluster
         FROM wrolled WHERE roll_cnt >= 3 AND roll_avg >= 1800.0),
       labeled AS (
         SELECT st.*,
           CASE WHEN st.cluster = h.home_cluster THEN 'H'
                WHEN w.work_cluster IS NOT NULL THEN 'W'
                ELSE 'O' END AS location_type
         FROM stays st
         LEFT JOIN home h ON st.user_id = h.user_id AND st.day_s = h.day_s
         LEFT JOIN work w ON st.user_id = w.user_id AND st.day_s = w.day_s
           AND st.cluster = w.work_cluster)"""

  /** Haversine meters between the running centroid carried in `r` and
    * ping `p` — spelled exactly like `Stops.haversineM`. Inlined (the
    * recursive term cannot bind a lateral alias portably).
    */
  private def havJoin: String = {
    val cLat = "(r.sum_lat / r.cnt)"
    val cLon = "(r.sum_lon / r.cnt)"
    s"""(p.t - r.t <= 518400 AND
       2 * 6371000 * asin(sqrt(
         pow(sin(radians(p.lat - $cLat) / 2), 2)
         + cos(radians($cLat)) * cos(radians(p.lat))
           * pow(sin(radians(p.lon - $cLon) / 2), 2))) <= 100.0)"""
  }

  /** The derived-ping projection (`Mobility.derivedPings`) in oracle SQL;
    * t is shifted by `tShift` (q242 localizes epochs before detection).
    */
  private def derivedPingsSql(tShift: String = ""): String =
    s"""SELECT CAST(user_id AS VARCHAR) AS user_id,
         CAST(floor(date_part('epoch', ts)) AS BIGINT)$tShift AS t,
         ((user_id % 80 - 40)
           + CASE WHEN hour(ts) BETWEEN 9 AND 17 THEN 0.01 ELSE 0.0 END)
           + (value % 0.0002) AS lat,
         ((user_id % 160)
           + CASE WHEN hour(ts) BETWEEN 9 AND 17 THEN 0.01 ELSE 0.0 END)
           + (value % 0.0002) AS lon,
         10.0 + abs(value % 50.0) AS accuracy
       FROM events"""

  /** Stop-detection CTE chain: a WITH RECURSIVE sequential replay of the
    * stationary-event scan (same ping order, same running-centroid state,
    * so the output centroid doubles are bit-identical sequential sums),
    * then a second recursion closing the single-linkage DBSCAN components
    * to fixpoint. Expects a CTE `dp` (user_id, t, lat, lon, accuracy);
    * yields `stopsOut` (user_id, t_start, t_end, n_pings, cluster_label,
    * lat, lon, med). Both haversine thresholds sit >= 55 m from every
    * distance the derived pings can produce, so trig-library differences
    * cannot flip a membership decision.
    */
  private def stopChain: String = {
    val havStops =
      """2 * 6371000 * asin(sqrt(
           pow(sin(radians(b.lat - a.lat) / 2), 2)
           + cos(radians(a.lat)) * cos(radians(b.lat))
             * pow(sin(radians(b.lon - a.lon) / 2), 2))) <= 100.0"""
    s"""pg AS MATERIALIZED (
         SELECT *, row_number() OVER (PARTITION BY user_id
                                      ORDER BY t, lat, lon) AS i
         FROM dp),
       rec AS (
         SELECT user_id, i, t, lat, lon, accuracy,
           i AS g, lat AS sum_lat, lon AS sum_lon, CAST(1 AS BIGINT) AS cnt
         FROM pg WHERE i = 1
         UNION ALL
         SELECT p.user_id, p.i, p.t, p.lat, p.lon, p.accuracy,
           CASE WHEN $havJoin THEN r.g ELSE p.i END,
           CASE WHEN $havJoin THEN r.sum_lat + p.lat ELSE p.lat END,
           CASE WHEN $havJoin THEN r.sum_lon + p.lon ELSE p.lon END,
           CASE WHEN $havJoin THEN r.cnt + 1 ELSE CAST(1 AS BIGINT) END
         FROM rec r JOIN pg p ON p.user_id = r.user_id AND p.i = r.i + 1),
       glast AS (SELECT user_id, g, max(i) AS li FROM rec GROUP BY 1, 2),
       accs AS (
         SELECT user_id, g, list(accuracy ORDER BY accuracy) AS arr
         FROM rec GROUP BY 1, 2),
       stops0 AS (
         SELECT r.user_id, r.g, p0.t AS t_start, r.t AS t_end,
           r.cnt AS n_pings, r.sum_lat / r.cnt AS lat,
           r.sum_lon / r.cnt AS lon,
           (a.arr[CAST((len(a.arr) + 1) // 2 AS INT)]
             + a.arr[CAST(len(a.arr) // 2 + 1 AS INT)]) / 2.0 AS med
         FROM rec r
         JOIN glast gl ON r.user_id = gl.user_id AND r.i = gl.li
           AND r.g = gl.g
         JOIN pg p0 ON p0.user_id = r.user_id AND p0.i = r.g
         JOIN accs a ON a.user_id = r.user_id AND a.g = r.g),
       sid AS MATERIALIZED (
         SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY g) AS s
         FROM stops0
         WHERE n_pings >= 2 AND t_end - t_start >= 600 AND med <= 100.0),
       edges AS MATERIALIZED (
         SELECT a.user_id, a.s AS x, b.s AS y
         FROM sid a JOIN sid b ON a.user_id = b.user_id AND $havStops),
       cc AS (
         SELECT user_id, s AS node, s AS lbl FROM sid
         UNION
         SELECT e.user_id, e.x, c.lbl
         FROM cc c JOIN edges e ON e.user_id = c.user_id AND e.y = c.node),
       comp AS (
         SELECT user_id, node AS s, min(lbl) AS root FROM cc GROUP BY 1, 2),
       stopsOut AS (
         SELECT si.user_id, si.t_start, si.t_end, si.n_pings,
           CAST(dense_rank() OVER (PARTITION BY si.user_id ORDER BY c.root)
             - 1 AS BIGINT) AS cluster_label,
           si.lat, si.lon, si.med
         FROM sid si JOIN comp c ON c.user_id = si.user_id AND c.s = si.s)"""
  }

  val oracles: Map[String, String] = Map(
    "q47_stop_detection" ->
      s"""WITH RECURSIVE dp AS MATERIALIZED (${derivedPingsSql()}),
         $stopChain
         SELECT user_id, t_start, t_end, n_pings, cluster_label,
           CAST(floor(lat * 1e6) AS BIGINT) AS lat_e6,
           CAST(floor(lon * 1e6) AS BIGINT) AS lon_e6,
           CAST(floor(med * 1e4) AS BIGINT) AS acc_e4
         FROM stopsOut""",
    // The COMPOSED 5-stage DAG, fully replayed: geocode is a pure band
    // comparison (the polygons were placed so no ping can sit on an
    // edge), tz localization shifts the epoch before the recursive
    // stop-detection walk, stop centroids re-geocode by the same bands,
    // day-split is integer day arithmetic, and the H/W/O chain is the
    // q50 label machinery over the pipeline's stays.
    "q242_gps_pipeline" -> {
      val offsetOf = (lonCol: String) =>
        s"""CASE WHEN $lonCol < 41.0035 THEN 0
             WHEN $lonCol < 81.0035 THEN 3600
             WHEN $lonCol < 121.0035 THEN 7200
             ELSE -3600 END"""
      val adminOf = (lonCol: String) =>
        s"""CASE WHEN $lonCol < 41.0035 THEN 'A0'
             WHEN $lonCol < 81.0035 THEN 'A1'
             WHEN $lonCol < 121.0035 THEN 'A2'
             ELSE 'A3' END"""
      s"""WITH RECURSIVE dp0 AS MATERIALIZED (${derivedPingsSql()}),
         dp AS MATERIALIZED (
           SELECT user_id, t + ${offsetOf("lon")} AS t, lat, lon, accuracy
           FROM dp0),
         $stopChain,
         gstops AS (
           SELECT *, ${adminOf("lon")} AS admin_id FROM stopsOut),
         sdays AS (
           SELECT *, unnest(range(t_start // 86400, t_end // 86400 + 1))
             AS dayn
           FROM gstops),
         stays AS (
           SELECT user_id, cluster_label AS cluster,
             dayn * 86400 AS day_s,
             greatest(t_start, dayn * 86400) AS t0,
             least(t_end, dayn * 86400 + 86400) AS t1,
             admin_id
           FROM sdays
           WHERE least(t_end, dayn * 86400 + 86400)
               > greatest(t_start, dayn * 86400)),
         $labelChain
         SELECT user_id, cluster, day_s, t0, t1, admin_id, location_type
         FROM labeled"""
    },
    "q50_home_work_label" ->
      s"""WITH stays AS ($eventStaysSql),
         $labelChain
         SELECT user_id, CAST(cluster AS BIGINT) AS cluster, day_s, t0, t1,
           location_type
         FROM labeled""",
    "q51_durations_pivot" ->
      s"""WITH stays AS ($eventStaysSql),
         $labelChain
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
