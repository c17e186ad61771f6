package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.operators.{GpsPipeline, Labeling, Stops}

/** SURVEY §7.2's golden end-to-end slice: pings → geocode → tz-localize →
  * stop detection → geocode stops → H/W/O labeling → durations, asserted
  * against hand-computed expectations (the reference DAG
  * `gps_pipeline.py:43-78` at toy scale).
  *
  * Fixture: two users in two admin polygons with DIFFERENT tz offsets.
  * Each user, on each of 3 weekdays (2024-01-01 Mon … 01-03 Wed, chosen so
  * the work-stay weekday gate passes), has
  *   - a "work" stop 10:00–16:00 LOCAL at a site ~5.5 km from home, and
  *   - a "home" stop 22:00–23:00 LOCAL.
  * u2's pings are emitted with UTC epochs shifted by −7200 s so that ONLY
  * a correct tz-localization recovers the same local wall-clock schedule —
  * mislocalized hours would fail the night predicate and flip labels.
  */
class GpsPipelineSpec extends SparkSpec {

  private val Day0 = 1704067200L // 2024-01-01 00:00 UTC, a Monday

  // admin A: lon 0..10, lat 0..10 (offset 0); admin B: lon 20..30 (offset 7200)
  private val admin = Seq(
    ("A", "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))"),
    ("B", "POLYGON ((20 0, 30 0, 30 10, 20 10, 20 0))"))
  private val offsets = Seq(("A", 0L), ("B", 7200L))

  /** One user's 3-day schedule in LOCAL epoch seconds, emitted as UTC. */
  private def userPings(user: String, homeLat: Double, homeLon: Double,
      offsetSec: Long): Seq[(String, Long, Double, Double, Double)] = {
    val workLat = homeLat + 0.05 // ~5.5 km: separate DBSCAN cluster at eps=50m
    for {
      d <- 0 to 2
      (localStart, stepSec, nPings, lat, lon) <- Seq(
        (36000L, 1800L, 13, workLat, homeLon), // 10:00–16:00 local
        (79200L, 600L, 7, homeLat, homeLon))   // 22:00–23:00 local
      k <- 0 until nPings
    } yield {
      val local = Day0 + d * 86400L + localStart + k * stepSec
      (user, local - offsetSec, lat, lon, 10.0)
    }
  }

  private lazy val result: GpsPipeline.Result = {
    val s = spark
    import s.implicits._
    val pings = (userPings("u1", 5.0, 5.0, 0L) ++
        userPings("u2", 5.0, 25.0, 7200L))
      .toDF("user_id", "t", "lat", "lon", "accuracy")
    val cfg = GpsPipeline.Config(
      labeling = Labeling.Params(homeWindowDays = 7, workWindowDays = 7,
        minPeriodsFrac = 0.1, workActivityAverageSec = 3600.0))
    GpsPipeline.run(pings, admin.toDF("admin_id", "wkt"),
      offsets.toDF("admin_id", "offset_sec"), cfg)
  }

  test("geocode + tz: every ping localized, local hours recover the schedule") {
    val loc = result.localizedPings
    assert(loc.count() == 2 * 3 * (13 + 7))
    // u2's UTC epochs are shifted, but local hours must match u1's
    val hours = loc.groupBy("user_id")
      .agg(sort_array(collect_set("local_hour")).as("hs"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(hours("u1") == hours("u2"))
    assert(hours("u1").toSet == Set(10L, 11, 12, 13, 14, 15, 16, 22, 23))
    val admins = loc.groupBy("user_id")
      .agg(collect_set("admin_id").as("a")).collect()
      .map(r => r.getString(0) -> r.getSeq[String](1).toSet).toMap
    assert(admins == Map("u1" -> Set("A"), "u2" -> Set("B")))
  }

  test("stop detection: 2 stops/user/day; home stops share one cluster") {
    val stops = result.stops
    assert(stops.count() == 2 * 3 * 2)
    // per user: the 3 work stops form one cluster, the 3 home stops another
    val byUser = stops.groupBy("userId")
      .agg(countDistinct("clusterLabel").as("k")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byUser == Map("u1" -> 2L, "u2" -> 2L))
  }

  test("stops re-geocoded to their user's admin") {
    val g = result.geocodedStops.groupBy("userId")
      .agg(collect_set("admin_id").as("a")).collect()
      .map(r => r.getString(0) -> r.getSeq[String](1).toSet).toMap
    assert(g == Map("u1" -> Set("A"), "u2" -> Set("B")))
  }

  test("labeling: night stays H, work stays W, on local days") {
    val labeled = result.labeledStays
      .select(col("user_id"), col("day_s"),
        expr("(t0 % 86400) div 3600").as("h0"), col("location_type"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getString(3)))
    assert(labeled.length == 2 * 3 * 2)
    labeled.foreach { case (u, dayS, h0, lt) =>
      val dayIdx = (dayS - Day0) / 86400
      assert(dayIdx >= 0 && dayIdx <= 2, s"local day off for $u: $dayS")
      val expected = if (h0 == 22L) "H" else "W"
      assert(lt == expected, s"$u day$dayIdx h0=$h0: got $lt")
    }
  }

  test("durations pivot: H=3600, W=21600 per (user, local day)") {
    val d = result.durations.collect()
    assert(d.length == 2 * 3)
    d.foreach { r =>
      assert(r.getAs[Long]("H") == 3600L, r.toString)
      assert(r.getAs[Long]("W") == 21600L, r.toString)
      assert(r.getAs[Long]("O") == 0L, r.toString)
    }
  }

  test("daily H fraction per user (the §7.2 tail aggregate)") {
    val frac = result.durations
      .groupBy("user_id")
      .agg(expr("sum(H) * 1000000 div sum(H + W + O)").as("h_frac_e6"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // 3600 / 25200 per day = 1/7
    assert(frac == Map("u1" -> 142857L, "u2" -> 142857L))
  }
}
