package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end GPS pipeline — the reference's top-level artifact: the chained
  * 5-stage DAG `geocodePings → tzOffset → stopLocations → geocodeStops →
  * HWlabeling` (`gps-analytics/airflow_home/dags/gps_pipeline.py:43-78`),
  * composed the way `CurationPipeline.curate` composes the text stages.
  *
  * Every stage is an already-verified operator (`SpatialJoin.geocode`,
  * `TimeZones.localize`, `Stops.detect`, `Labeling.labelStays`); this object
  * owns only the stage CONTRACTS — which columns flow between stages, and
  * which clock (UTC vs local) each stage runs on:
  *
  *  1. geocodePings — assign each ping its admin polygon (broadcast
  *     grid-join + exact refine; pings outside every polygon drop, the
  *     reference's discard of pings outside the country shapefile).
  *  2. tzOffset — localize ping epochs via the per-admin offset dim
  *     (`tz_offset.scala:26-48`); everything downstream runs on LOCAL time,
  *     exactly like the reference (`stop_locations.py:73` localizes before
  *     stop detection so night/day hours mean wall-clock hours).
  *  3. stopLocations — `Stops.detect` over (user, local t): stationary
  *     events + per-user DBSCAN(eps, 1) clustering.
  *  4. geocodeStops — stop centroids re-geocoded against the same admin dim
  *     (`geocode_stop_locations.scala`): a stop's admin can differ from its
  *     pings' (centroid near a border), so the reference geocodes again.
  *  5. HWlabeling — day-split stops into per-day stays, then the H/W/O
  *     labeling decomposition (`compute_home_and_work_locations.py`).
  *
  * Scale shape: polygons and tz offsets are broadcast dims; the only
  * slot-to-slot shuffle of the big side is the ONE hash shuffle on user_id
  * into `Stops.detect` — stages 1-2 are map-only onto the ping scan, and
  * everything after stop detection operates on stops (orders of magnitude
  * smaller than pings). At 100 TB of pings this is scan → broadcast-join →
  * one keyed shuffle → per-user scans → dim-sized tails.
  */
object GpsPipeline {

  /** Stage parameters; defaults are the production DAG's
    * (`gps_pipeline.py:58,70-74`). `gridRes`/`bufferDeg` parameterize the
    * candidate grid of both geocode stages.
    */
  case class Config(
      stops: Stops.Params = Stops.Params(),
      labeling: Labeling.Params = Labeling.Params(),
      gridRes: Int = 8,
      bufferDeg: Double = 0.005,
      maxAccuracyMeters: Double = 100.0)

  /** Materialized stage outputs — the reference persists each stage to its
    * own directory between Airflow tasks, so callers get every boundary,
    * not just the tail.
    */
  case class Result(
      localizedPings: DataFrame,
      stops: DataFrame,
      geocodedStops: DataFrame,
      labeledStays: DataFrame,
      durations: DataFrame)

  /** Run the full DAG.
    *
    * @param pings     (user_id, t [epoch sec UTC], lat, lon, accuracy)
    * @param admin     small dim (admin_id, wkt) — admin polygons
    * @param tzOffsets small dim (admin_id, offset_sec)
    */
  def run(pings: DataFrame, admin: DataFrame, tzOffsets: DataFrame,
      cfg: Config = Config()): Result = {
    // F5 data assertions (`stop_locations.py` --max_accuracy): drop
    // malformed / low-quality pings before anything downstream sees them.
    val valid = pings.where(
      col("t").isNotNull && col("lat").between(-90.0, 90.0) &&
        col("lon").between(-180.0, 180.0) &&
        col("accuracy") <= cfg.maxAccuracyMeters)

    // 1. geocodePings (map-only: broadcast cells + codegen refine)
    val geocoded = SpatialJoin.geocode(
      valid, "lat", "lon", admin, "wkt", cfg.gridRes, cfg.bufferDeg)

    // 2. tzOffset (broadcast dim; adds local_epoch/local_hour/local_day_s)
    val localized = TimeZones.localize(
      geocoded, "admin_id", "t", tzOffsets)

    // 3. stopLocations on LOCAL clocks (one shuffle on user_id)
    val stops = Stops.detect(
      localized.select(col("user_id"), col("local_epoch").as("t"),
        col("lat"), col("lon"), col("accuracy")),
      cfg.stops).toDF()

    // 4. geocodeStops: centroids re-geocoded (stop admin may differ from
    // ping admin near borders)
    val geocodedStops = SpatialJoin.geocode(
      stops, "lat", "lon", admin, "wkt", cfg.gridRes, cfg.bufferDeg)

    // 5. HWlabeling: stops → per-day stays → H/W/O labels → durations
    val stays = Stops.daySplit(
        geocodedStops.select(col("userId").as("user_id"),
          col("clusterLabel").cast("long").as("cluster"),
          col("tStart"), col("tEnd"), col("admin_id"),
          col("lat"), col("lon")),
        "tStart", "tEnd")
      .select(col("user_id"), col("cluster"),
        unix_timestamp(col("day")).as("day_s"),
        col("t0"), col("t1"), col("admin_id"), col("lat"), col("lon"))
    val labeled = Labeling.labelStays(stays, cfg.labeling)
    Result(localized, stops, geocodedStops, labeled,
      Labeling.durations(labeled))
  }
}
