package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Stops
import graft.operators.Stops.{Ping, Params}

/** Golden tests for the stationary-event scan + clustering, mirroring the
  * reference's ground-truth approach at unit scale (SURVEY §5.2).
  */
class StopsSpec extends AnyFunSuite {

  val p = Params(r1Meters = 50, minStayingTimeSec = 300, maxTimeBetweenSec = 3600,
    minSize = 2, maxAccuracyMeters = 100, epsMeters = 50)

  def ping(t: Long, lat: Double, lon: Double, acc: Double = 10.0) =
    Ping("u", t, lat, lon, acc)

  // ~0.0001 deg latitude = 11.1 m
  test("stationary pings within r1 form one stop with centroid") {
    val pings = Array(
      ping(0, 10.0000, 20.0000), ping(100, 10.0001, 20.0001),
      ping(250, 10.0002, 20.0000), ping(400, 10.0001, 20.0002))
    val st = Stops.stationaryEvents(pings, p)
    assert(st.size == 1)
    assert(st.head.tStart == 0 && st.head.tEnd == 400)
    assert(st.head.nPings == 4)
    assert(math.abs(st.head.lat - 10.0001) < 1e-9)
    assert(st.head.medianAccuracy == 10.0)
  }

  test("span below minStayingTime is dropped") {
    val pings = Array(ping(0, 10, 20), ping(100, 10.0001, 20))
    assert(Stops.stationaryEvents(pings, p).isEmpty)
  }

  test("gap above maxTimeBetween splits events") {
    val pings = Array(
      ping(0, 10, 20), ping(300, 10.0001, 20),
      ping(300 + 3601, 10.0001, 20), ping(300 + 3601 + 400, 10, 20))
    val st = Stops.stationaryEvents(pings, p)
    assert(st.size == 2)
    assert(st(0).tEnd == 300 && st(1).tStart == 3901)
  }

  test("movement beyond r1 from rolling centroid starts a new event") {
    val pings = Array(
      ping(0, 10, 20), ping(300, 10.0001, 20),
      ping(400, 10.01, 20), // ~1.1 km away
      ping(800, 10.0101, 20))
    val st = Stops.stationaryEvents(pings, p)
    assert(st.size == 2)
    assert(math.abs(st(1).lat - 10.01005) < 1e-9)
  }

  test("median accuracy above max drops the stop") {
    val pings = Array(
      ping(0, 10, 20, 150), ping(200, 10.0001, 20, 150), ping(400, 10, 20, 50))
    assert(Stops.stationaryEvents(pings, p).isEmpty) // median = 150 > 100
  }

  test("DBSCAN(min_samples=1) == eps connected components, transitive") {
    // a-b within eps, b-c within eps, a-c NOT within eps -> still one cluster
    def stop(lat: Double) = Stops.Stop("u", 0, 0, lat, 20.0, 10, 2, -1)
    val stops = IndexedSeq(stop(10.0), stop(10.0004), stop(10.0008))
    val labels = Stops.clusterLabels(stops, 50.0)
    assert(labels.toSet.size == 1)
    // far stop gets its own label; labels are first-seen ordered
    val labels2 = Stops.clusterLabels(stops :+ stop(11.0), 50.0)
    assert(labels2.toSeq == Seq(0, 0, 0, 1))
  }

  test("stop invariants on random-ish walk (property-style)") {
    val rnd = new scala.util.Random(42)
    var t = 0L
    val pings = Array.fill(500) {
      t += 60 + rnd.nextInt(600)
      ping(t, 10 + rnd.nextInt(3) * 0.01 + rnd.nextDouble() * 1e-5,
        20 + rnd.nextInt(2) * 0.01, 5 + rnd.nextDouble() * 10)
    }
    val st = Stops.stationaryEvents(pings, p)
    // ordered, non-overlapping, each respects thresholds
    st.sliding(2).foreach {
      case Seq(a, b) => assert(a.tEnd <= b.tStart)
      case _ =>
    }
    st.foreach { s =>
      assert(s.tEnd - s.tStart >= p.minStayingTimeSec)
      assert(s.nPings >= p.minSize)
      assert(s.medianAccuracy <= p.maxAccuracyMeters)
    }
  }
}
