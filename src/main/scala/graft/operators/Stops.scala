package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Per-user stop detection and clustering — the reference's central custom
  * operator (SURVEY §2.10 F2/F3).
  *
  * The reference runs a pandas GROUPED_MAP per user calling Infostop's
  * `get_stationary_events` then DBSCAN (`gps-analytics/src/wbgps/stops.py:71-96`;
  * algorithm spec `compiled-bookdown/04-stops.Rmd:10-33`). Here the whole
  * computation stays in the JVM as `groupByKey(_.userId).flatMapGroups` —
  * no Arrow/Python boundary, codegen-friendly upstream and downstream.
  *
  * Scale shape: one hash shuffle on user_id, then per-user in-memory scans.
  * Users are independent (embarrassingly parallel); per-user history must be
  * bounded by the caller at 100 TB (SURVEY §7.3) — the append pipeline's
  * window does exactly that.
  *
  * Semantics (from `04-stops.Rmd:16-31` / Infostop, arXiv:2003.14370):
  *  - a stationary event is a maximal run of consecutive pings where each
  *    ping lies within `r1` meters of the running centroid of the event and
  *    the gap to the previous ping is at most `maxTimeBetween` seconds;
  *  - an event is kept if it spans at least `minStayingTime` seconds and has
  *    at least `minSize` pings and median accuracy at most `maxAccuracy`;
  *  - kept events ("stops") are then clustered per user with
  *    DBSCAN(eps, min_samples=1) over stop centroids — which is exactly
  *    haversine single-linkage connected components at `eps`
  *    (`wbgps/stops.py:91-93`).
  */
object Stops {

  /** Production defaults from `airflow_home/dags/gps_pipeline.py:58`. */
  case class Params(
      r1Meters: Double = 50.0,
      minStayingTimeSec: Long = 300,
      maxTimeBetweenSec: Long = 3600,
      minSize: Int = 2,
      maxAccuracyMeters: Double = 100.0,
      epsMeters: Double = 50.0)

  case class Ping(userId: String, t: Long, lat: Double, lon: Double, accuracy: Double)

  case class Stop(
      userId: String,
      tStart: Long,
      tEnd: Long,
      lat: Double,
      lon: Double,
      medianAccuracy: Double,
      nPings: Int,
      clusterLabel: Int)

  private val R = 6371000.0

  def haversineM(lat1: Double, lon1: Double, lat2: Double, lon2: Double): Double = {
    val dLat = math.toRadians(lat2 - lat1) / 2
    val dLon = math.toRadians(lon2 - lon1) / 2
    val a = math.sin(dLat) * math.sin(dLat) +
      math.cos(math.toRadians(lat1)) * math.cos(math.toRadians(lat2)) *
        math.sin(dLon) * math.sin(dLon)
    2 * R * math.asin(math.sqrt(a))
  }

  /** Stationary-event scan over one user's pings (sorted by time). */
  private[graft] def stationaryEvents(
      pings: Array[Ping], p: Params): Seq[Stop] = {
    val out = collection.mutable.ArrayBuffer.empty[Stop]
    var i = 0
    val n = pings.length
    var gStart = 0 // current event start index
    var sumLat = 0.0; var sumLon = 0.0
    var gCount = 0

    def flush(endExclusive: Int): Unit = {
      if (gCount >= p.minSize) {
        val first = pings(gStart); val last = pings(endExclusive - 1)
        if (last.t - first.t >= p.minStayingTimeSec) {
          val accs = new Array[Double](gCount)
          var k = 0
          while (k < gCount) { accs(k) = pings(gStart + k).accuracy; k += 1 }
          java.util.Arrays.sort(accs)
          val med =
            if (gCount % 2 == 1) accs(gCount / 2)
            else (accs(gCount / 2 - 1) + accs(gCount / 2)) / 2.0
          if (med <= p.maxAccuracyMeters) {
            out += Stop(first.userId, first.t, last.t,
              sumLat / gCount, sumLon / gCount, med, gCount, -1)
          }
        }
      }
    }

    while (i < n) {
      val ping = pings(i)
      val join = gCount > 0 && {
        val cLat = sumLat / gCount; val cLon = sumLon / gCount
        ping.t - pings(i - 1).t <= p.maxTimeBetweenSec &&
          haversineM(cLat, cLon, ping.lat, ping.lon) <= p.r1Meters
      }
      if (join) {
        sumLat += ping.lat; sumLon += ping.lon; gCount += 1
      } else {
        if (gCount > 0) flush(i)
        gStart = i; sumLat = ping.lat; sumLon = ping.lon; gCount = 1
      }
      i += 1
    }
    if (gCount > 0) flush(n)
    out.toSeq
  }

  /** DBSCAN(eps, min_samples=1) == single-linkage connected components at
    * eps (`wbgps/stops.py:91-93`). Labels are assigned in order of each
    * component's first stop (by tStart) so output is deterministic.
    */
  private[graft] def clusterLabels(stops: IndexedSeq[Stop], epsMeters: Double): Array[Int] = {
    val n = stops.length
    val parent = Array.tabulate(n)(identity)
    def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); var c = x
      while (parent(c) != r) { val nx = parent(c); parent(c) = r; c = nx }; r }
    def union(a: Int, b: Int): Unit = { val ra = find(a); val rb = find(b); if (ra != rb) parent(rb) = ra }
    var i = 0
    while (i < n) {
      var j = i + 1
      while (j < n) {
        if (haversineM(stops(i).lat, stops(i).lon, stops(j).lat, stops(j).lon) <= epsMeters)
          union(i, j)
        j += 1
      }
      i += 1
    }
    val labelOf = collection.mutable.LinkedHashMap.empty[Int, Int]
    val out = new Array[Int](n)
    i = 0
    while (i < n) {
      out(i) = labelOf.getOrElseUpdate(find(i), labelOf.size)
      i += 1
    }
    out
  }

  private def processUser(pings: Iterator[Ping], p: Params): Iterator[Stop] = {
    val arr = pings.toArray
    java.util.Arrays.sort(arr, Ordering.by((x: Ping) => (x.t, x.lat, x.lon)))
    val events = stationaryEvents(arr, p).toIndexedSeq
    val labels = clusterLabels(events, p.epsMeters)
    events.iterator.zipWithIndex.map { case (s, i) => s.copy(clusterLabel = labels(i)) }
  }

  /** Detect stops. Input: any frame with (user_id, t, lat, lon, accuracy). */
  def detect(pings: DataFrame, p: Params = Params()): Dataset[Stop] = {
    val spark = pings.sparkSession
    import spark.implicits._
    pings
      .select(
        col("user_id").cast("string").as("userId"),
        col("t").cast("long").as("t"),
        col("lat").cast("double"),
        col("lon").cast("double"),
        col("accuracy").cast("double"))
      .as[Ping]
      .groupByKey(_.userId)
      .flatMapGroups((_: String, it: Iterator[Ping]) => processUser(it, p))
  }

  /** Re-cluster previously detected stops per user (append pipeline, F3 —
    * `wbgps/stops.py:113-122`, `stop_locations_append.py:128-132`).
    */
  def recluster(stops: Dataset[Stop], epsMeters: Double): Dataset[Stop] = {
    val spark = stops.sparkSession
    import spark.implicits._
    stops.groupByKey(_.userId).flatMapGroups { (_: String, it: Iterator[Stop]) =>
      val arr = it.toArray.sortBy(s => (s.tStart, s.tEnd))
      val labels = clusterLabels(arr.toIndexedSeq, epsMeters)
      arr.iterator.zipWithIndex.map { case (s, i) => s.copy(clusterLabel = labels(i)) }
    }
  }

  /** F1 day-splitter as pure column expressions (`stop_locations.py:39-57`):
    * explode an epoch-second interval [tStart, tEnd] into day-aligned
    * sub-intervals. Declarative (sequence + explode) — no UDF.
    * Returns the frame with (day, t0, t1) added, one row per touched day.
    */
  def daySplit(df: DataFrame, tStartCol: String, tEndCol: String): DataFrame =
    df
      .withColumn("day", explode(sequence(
        date_trunc("day", timestamp_seconds(col(tStartCol))),
        date_trunc("day", timestamp_seconds(col(tEndCol))),
        expr("interval 1 day"))))
      .withColumn("t0", greatest(col(tStartCol), unix_timestamp(col("day"))))
      .withColumn("t1", least(col(tEndCol), unix_timestamp(col("day")) + 86400))
      .where(col("t1") > col("t0"))
}
