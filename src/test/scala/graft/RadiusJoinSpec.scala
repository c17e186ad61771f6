package graft

import org.apache.spark.sql.functions._
import graft.operators.SpatialJoin

/** k-ring radius self-join: candidate completeness across cell borders,
  * exactly-once pair emission, and off-grid ring handling at the edges.
  */
class RadiusJoinSpec extends SparkSpec {

  private def run(pts: Seq[(Long, Double, Double)], r: Double, res: Int) = {
    import spark.implicits._
    SpatialJoin.radiusSelfJoin(
      pts.toDF("id", "lat", "lon"), "id", "lat", "lon", r, res)
  }

  test("pairs straddling a cell boundary are found") {
    // res 6 -> cell size 2.8125 deg; boundary at lat = 2.8125 - 90 ... use
    // two points 0.2 deg apart on either side of a lat cell border and two
    // across a lon border.
    val s = graft.functions.Grid.cellSizeDeg(6)
    val latBorder = -90.0 + 10 * s
    val lonBorder = -180.0 + 14 * s
    val pts = Seq(
      (1L, latBorder - 0.1, 0.0), (2L, latBorder + 0.1, 0.0),
      (3L, 10.0, lonBorder - 0.1), (4L, 10.0, lonBorder + 0.1))
    val got = run(pts, 1.0, 6).select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 2L), (3L, 4L)))
  }

  test("each pair is emitted exactly once (no ring double-count)") {
    // a tight cluster within one cell: every pair shares 9 ring cells but
    // must appear once.
    val pts = (1L to 5L).map(i => (i, 20.0 + i * 0.01, 30.0 + i * 0.01))
    val out = run(pts, 1.0, 6).select("a_id", "b_id").collect()
    assert(out.length == 10) // C(5,2)
    assert(out.map(r => (r.getLong(0), r.getLong(1))).distinct.length == 10)
  }

  test("points beyond the radius are excluded") {
    val pts = Seq((1L, 0.0, 0.0), (2L, 0.0, 1.5), (3L, 0.0, 4.0))
    val got = run(pts, 2.0, 6).select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 2L)))
  }

  test("grid-edge points near poles and antimeridian do not crash or dup") {
    val pts = Seq(
      (1L, 89.9, 179.9), (2L, 89.8, 179.8),   // top-right corner
      (3L, -89.9, -179.9), (4L, -89.8, -179.8)) // bottom-left corner
    val out = run(pts, 2.0, 6).select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSet == Set((1L, 2L), (3L, 4L)))
    assert(out.length == 2)
  }

  test("matches brute force on 300 deterministic pseudo-random points") {
    // fixed-seed congruential points; brute-force pair set computed in
    // Scala with the same planar metric.
    val pts = (1L to 300L).map { i =>
      val h = i * 2654435761L % 1000003L
      val lat = (h % 17000L).toDouble / 100.0 - 85.0
      val lon = ((h / 17000L) % 35000L).toDouble / 100.0 - 175.0
      (i, lat, lon)
    }
    val r = 2.0
    val expected = (for {
      a <- pts; b <- pts if a._1 < b._1
      d2 = (a._2 - b._2) * (a._2 - b._2) + (a._3 - b._3) * (a._3 - b._3)
      if d2 <= r * r
    } yield (a._1, b._1)).toSet
    val got = run(pts, r, 6).select("a_id", "b_id").collect()
      .map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(got == expected,
      s"missing=${(expected -- got).take(5)} extra=${(got -- expected).take(5)}")
  }

  test("radius larger than the cell size is rejected") {
    intercept[IllegalArgumentException] {
      run(Seq((1L, 0.0, 0.0)), 5.0, 6)
    }
  }
}
