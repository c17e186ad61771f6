package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.Stops

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
    }))

  val oracles: Map[String, String] = Map(
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
         WHERE least(e0, day_s + 86400) > greatest(s0, day_s)""")
}
