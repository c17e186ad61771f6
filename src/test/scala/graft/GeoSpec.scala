package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{Grid, Wkt}

class GeoSpec extends AnyFunSuite {

  val square = "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))"
  val donut = "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (4 4, 6 4, 6 6, 4 6, 4 4))"
  val multi = "MULTIPOLYGON (((0 0, 2 0, 2 2, 0 2, 0 0)), ((5 5, 7 5, 7 7, 5 7, 5 5)))"

  test("WKT parse + ray cast: square") {
    val g = Wkt.parse(square).get
    assert(g.contains(5.0, 5.0))
    assert(!g.contains(11.0, 5.0))
    assert(!g.contains(-0.1, 5.0))
    assert(g.contains(0.001, 0.001))
  }

  test("polygon hole subtracts") {
    val g = Wkt.parse(donut).get
    assert(g.contains(1.0, 1.0))
    assert(!g.contains(5.0, 5.0)) // inside the hole
    assert(g.contains(3.9, 5.0)) // just outside the hole
  }

  test("multipolygon: either part contains") {
    val g = Wkt.parse(multi).get
    assert(g.contains(1.0, 1.0))
    assert(g.contains(6.0, 6.0))
    assert(!g.contains(3.0, 3.0)) // gap between parts
  }

  test("concave polygon (L-shape)") {
    val l = "POLYGON ((0 0, 10 0, 10 4, 4 4, 4 10, 0 10, 0 0))"
    val g = Wkt.parse(l).get
    assert(g.contains(2.0, 8.0))
    assert(g.contains(8.0, 2.0))
    assert(!g.contains(8.0, 8.0)) // the notch
  }

  test("malformed WKT -> None") {
    assert(Wkt.parse("POLYGON ((0 0, 1").isEmpty)
    assert(Wkt.parse("LINESTRING (0 0, 1 1)").isEmpty)
    assert(Wkt.parse(null).isEmpty)
  }

  test("grid cell is stable and in range") {
    val c = Grid.cell(41.9, 12.5, 10)
    assert(c == Grid.cell(41.9, 12.5, 10))
    // poles/antimeridian clamp instead of overflowing
    assert(Grid.cell(90.0, 180.0, 10) ==
      ((1L << 10) - 1) * Grid.LON_STRIDE + ((2L << 10) - 1))
    assert(Grid.cell(-90.0, -180.0, 10) == 0L)
  }

  test("two points closer than a cell share a cell; far points don't") {
    assert(Grid.cell(41.9000, 12.5000, 8) == Grid.cell(41.9001, 12.5001, 8))
    assert(Grid.cell(41.9, 12.5, 10) != Grid.cell(45.0, 20.0, 10))
  }

  test("polygonCells covers every contained point's cell (buffer included)") {
    val cells = Grid.polygonCells(square, 8, 0.005).toSet
    for (lat <- Seq(0.01, 3.33, 9.99); lon <- Seq(0.01, 5.0, 9.99))
      assert(cells.contains(Grid.cell(lat, lon, 8)),
        s"cell of ($lat,$lon) missing from covering")
    // buffered edge: a point just outside still lands in a covered cell
    assert(cells.contains(Grid.cell(-0.004, 5.0, 8)))
  }

  test("scanline covering skips empty envelope corners but keeps the shape") {
    val tri = "POLYGON ((0 0, 10 0, 0 10, 0 0))"
    val g = Wkt.parse(tri).get
    val cells = Grid.polygonCells(tri, 8, 0.0).toSet
    // every point inside the triangle maps to a covered cell
    for (lat <- Seq(0.1, 2.5, 4.9, 9.5); lon <- Seq(0.1, 2.5, 4.9)
         if g.contains(lon, lat))
      assert(cells.contains(Grid.cell(lat, lon, 8)),
        s"cell of ($lat,$lon) missing from covering")
    // the empty envelope corner is NOT covered (old envelope cover included it)
    assert(!cells.contains(Grid.cell(9.0, 9.0, 8)))
    assert(!g.contains(9.0, 9.0))
  }

  test("scanline covering of a thin diagonal is ~O(perimeter), not envelope area") {
    // thin diagonal strip from (0,0) to (10,10), width ~0.2 deg
    val strip = "POLYGON ((0 0, 0.2 0, 10 9.8, 10 10, 9.8 10, 0 0.2, 0 0))"
    val scan = Grid.polygonCells(strip, 8, 0.005)
    val g = Wkt.parse(strip).get
    // correctness: interior points' cells are covered
    for (t <- Seq(0.5, 2.5, 5.0, 7.5, 9.5))
      assert(scan.toSet.contains(Grid.cell(t, t, 8)))
    // the full envelope at res 8 is ~15x15 cells; the strip's scanline
    // cover must be far below half of it
    val s = Grid.cellSizeDeg(8)
    val envelopeCells = (math.ceil(10.0 / s) + 1) * (math.ceil(10.0 / s) + 1)
    assert(scan.length < envelopeCells / 3,
      s"scanline emitted ${scan.length} of ~$envelopeCells envelope cells")
  }
}
