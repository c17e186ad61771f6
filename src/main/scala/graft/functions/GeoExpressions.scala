package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Grid index + point-in-polygon expressions — the engine's stand-in for the
  * reference's H3/Sedona surface (SURVEY §2.10 F6/F7).
  *
  * The reference indexes pings with `geoToH3(lat, lon, res)` and covers admin
  * polygons with `multiPolygonToH3` (`gps-analytics/src/pipeline/
  * get_geocoded_pings.scala:48-50`), then refines with `ST_Intersects`
  * (`geocode_stop_locations.scala:82-88`). Same contract here on a square
  * lat/lon grid: a point maps to one cell, a polygon to its covering cells
  * (envelope-based, over-approximate — the exact test decides membership).
  *
  * Cell layout at `res`: cell side = 180/2^res degrees;
  * `cell = latIdx * 2^22 + lonIdx`. Valid for res <= 20.
  */
object Grid {
  val LON_STRIDE = 1L << 22

  def cellSizeDeg(res: Int): Double = 180.0 / (1L << res)

  /** Point -> cell id. Deliberately expressible in ANSI SQL (floor + least)
    * so DuckDB oracles can replay it exactly.
    */
  def cell(lat: Double, lon: Double, res: Int): Long = {
    val s = cellSizeDeg(res)
    val latIdx = math.min(math.floor((lat + 90.0) / s).toLong, (1L << res) - 1)
    val lonIdx = math.min(math.floor((lon + 180.0) / s).toLong, (2L << res) - 1)
    latIdx * LON_STRIDE + lonIdx
  }

  /** Covering cells of a WKT polygon expanded by `bufferDeg` (the reference
    * buffers polygons by 0.005 deg so border cells aren't missed,
    * `geocode_stop_locations.scala:36-41`), computed by SCANLINE over cell
    * rows: for each row of cells the polygon's latitude band touches, only
    * the cells between the ring's min and max x within that band are
    * emitted (vertices inside the band plus edge crossings of its bounds).
    * A diagonal coastline admin thus generates O(perimeter) candidates, not
    * O(envelope area) — at billions of points that difference is the cost
    * of the two-phase join. Still a safe over-approximation (per-band
    * x-range is a single interval; holes are ignored): the exact
    * ST-contains refine decides membership, mirroring the reference's
    * `multiPolygonToH3` cover (`get_geocoded_pings.scala:50`).
    */
  def polygonCells(wkt: String, res: Int, bufferDeg: Double): Array[Long] = {
    Wkt.parse(wkt) match {
      case None => null
      case Some(g) =>
        val s = cellSizeDeg(res)
        val maxLatIdx = (1L << res) - 1
        val maxLonIdx = (2L << res) - 1
        val cells = new java.util.TreeSet[java.lang.Long]()
        for (p <- g.polys) {
          val r = p.outer
          var minY = Double.MaxValue; var maxY = -Double.MaxValue
          var v = 0
          while (v < r.size) {
            if (r.ys(v) < minY) minY = r.ys(v)
            if (r.ys(v) > maxY) maxY = r.ys(v)
            v += 1
          }
          val yLo = math.max(minY - bufferDeg, -90.0)
          val yHi = math.min(maxY + bufferDeg, 90.0)
          var latIdx = math.min(math.floor((yLo + 90.0) / s).toLong, maxLatIdx)
          val latIdxHi = math.min(math.floor((yHi + 90.0) / s).toLong, maxLatIdx)
          while (latIdx <= latIdxHi) {
            // this cell row, widened by the buffer, as a latitude band
            val bandLo = latIdx * s - 90.0 - bufferDeg
            val bandHi = (latIdx + 1) * s - 90.0 + bufferDeg
            var xMin = Double.MaxValue; var xMax = -Double.MaxValue
            var j = r.size - 1
            var i = 0
            while (i < r.size) {
              val xi = r.xs(i); val yi = r.ys(i)
              val xj = r.xs(j); val yj = r.ys(j)
              if (yi >= bandLo && yi <= bandHi) { // vertex inside band
                if (xi < xMin) xMin = xi
                if (xi > xMax) xMax = xi
              }
              if (yi != yj) { // edge crossings of the band bounds
                val eLo = math.min(yi, yj); val eHi = math.max(yi, yj)
                var b = 0
                while (b < 2) {
                  val yb = if (b == 0) bandLo else bandHi
                  if (yb >= eLo && yb <= eHi) {
                    val x = xi + (xj - xi) * (yb - yi) / (yj - yi)
                    if (x < xMin) xMin = x
                    if (x > xMax) xMax = x
                  }
                  b += 1
                }
              }
              j = i
              i += 1
            }
            if (xMin <= xMax) {
              val lonLo = math.min(math.max(
                math.floor((math.max(xMin - bufferDeg, -180.0) + 180.0) / s).toLong, 0L), maxLonIdx)
              val lonHi = math.min(math.max(
                math.floor((math.min(xMax + bufferDeg, 180.0) + 180.0) / s).toLong, 0L), maxLonIdx)
              var lon = lonLo
              while (lon <= lonHi) {
                cells.add(latIdx * LON_STRIDE + lon)
                lon += 1
              }
            }
            latIdx += 1
          }
        }
        val out = new Array[Long](cells.size)
        val it = cells.iterator()
        var k = 0
        while (it.hasNext) { out(k) = it.next(); k += 1 }
        out
    }
  }

  /** Small parse cache — admin/dim polygons are few but appear on many rows. */
  private val parseCache = new java.util.concurrent.ConcurrentHashMap[String, AnyRef]()
  private val MISS = new Object

  def parsed(wkt: String): Wkt.Geom = {
    var v = parseCache.get(wkt)
    if (v == null) {
      if (parseCache.size > 4096) parseCache.clear()
      v = Wkt.parse(wkt).getOrElse(MISS)
      parseCache.put(wkt, v)
    }
    if (v eq MISS) null else v.asInstanceOf[Wkt.Geom]
  }

  def contains(wkt: String, lon: Double, lat: Double): java.lang.Boolean = {
    val g = parsed(wkt)
    if (g == null) null else java.lang.Boolean.valueOf(g.contains(lon, lat))
  }
}

/** `graft_grid_cell(lat, lon, res)` — native codegen expression (whole-stage
  * codegen keeps the geocode hot path fused with the scan/filter pipeline).
  */
case class GridCellExpr(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_grid_cell"

  override protected def nullSafeEval(lat: Any, lon: Any, res: Any): Any =
    Grid.cell(lat.asInstanceOf[Double], lon.asInstanceOf[Double], res.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (lat, lon, res) =>
      s"graft.functions.Grid.cell($lat, $lon, $res)")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

/** `graft_polygon_cells(wkt, res, bufferDeg)` — covering cells array, meant
  * to be exploded on the (small) polygon side of the spatial join.
  */
case class PolygonCellsExpr(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_polygon_cells"

  override protected def nullSafeEval(wkt: Any, res: Any, buf: Any): Any = {
    val cells = Grid.polygonCells(
      wkt.asInstanceOf[UTF8String].toString, res.asInstanceOf[Int], buf.asInstanceOf[Double])
    if (cells == null) null else new GenericArrayData(cells)
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

/** `graft_st_contains(wkt, lon, lat)` — exact even-odd ray cast; the refine
  * step of the two-phase join (ref `geocode_stop_locations.scala:85-88`).
  */
case class StContainsExpr(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with CodegenFallback {
  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_st_contains"

  override protected def nullSafeEval(wkt: Any, lon: Any, lat: Any): Any = {
    val r = Grid.contains(wkt.asInstanceOf[UTF8String].toString,
      lon.asInstanceOf[Double], lat.asInstanceOf[Double])
    if (r == null) null else r.booleanValue()
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}
