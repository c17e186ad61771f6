package graft

import org.apache.spark.sql.functions._
import graft.operators.Stops

/** Incremental append pipeline (SURVEY §2.9,
  * `stop_locations_append.py:80-132`): keep old stops that start before the
  * overlap window, recompute stops from recent pings only, union, recluster
  * all stops per user. Must equal a full recompute when the overlap covers
  * every in-flight stop.
  */
class StopsAppendSpec extends SparkSpec {

  val p = Stops.Params(r1Meters = 50, minStayingTimeSec = 300,
    maxTimeBetweenSec = 3600, minSize = 2, maxAccuracyMeters = 100, epsMeters = 50)
  val day = 86400L

  /** One ~1h stop per active day, alternating between two sites. */
  def pings() = {
    import spark.implicits._
    val rows = (Seq.range(0, 10) ++ Seq.range(12, 20)).flatMap { d =>
      val site = if (d % 2 == 0) 10.0 else 10.01
      (0 until 5).map { k =>
        ("u1", d * day + 36000L + k * 900L, site + k * 1e-5, 20.0, 10.0)
      }
    }
    rows.toDF("user_id", "t", "lat", "lon", "accuracy")
  }

  test("append (filter + recompute overlap + union + recluster) == full recompute") {
    val all = pings()
    val cutoff = 16 * day // "now"; overlap = 2 days back
    val overlapStart = cutoff - 2 * day

    val full = Stops.detect(all, p)

    // previous run: everything before the cutoff
    val oldStops = Stops.detect(all.where(col("t") < cutoff), p)
      .where(col("tStart") < overlapStart)
    // new run: pings in the overlap + the fresh tail
    val newStops = Stops.detect(all.where(col("t") >= overlapStart), p)
    val appended = Stops.recluster(oldStops.union(newStops), p.epsMeters)

    val key = Seq("userId", "tStart", "tEnd", "lat", "lon", "nPings", "clusterLabel")
    val a = full.toDF().select(key.map(col): _*).collect().toSet
    val b = appended.toDF().select(key.map(col): _*).collect().toSet
    assert(a.nonEmpty)
    assert(a == b)
  }
}
