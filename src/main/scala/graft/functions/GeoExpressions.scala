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

  /** Covering cells of a WKT polygon's envelope expanded by `bufferDeg`
    * (the reference buffers polygons by 0.005 deg so border cells aren't
    * missed, `geocode_stop_locations.scala:36-41`). Over-approximation is
    * safe: this is the candidate generator of a two-phase join.
    */
  def polygonCells(wkt: String, res: Int, bufferDeg: Double): Array[Long] = {
    Wkt.parse(wkt) match {
      case None => null
      case Some(g) =>
        val (minX, minY, maxX, maxY) = g.envelope
        val s = cellSizeDeg(res)
        val lo = cell(math.max(minY - bufferDeg, -90.0), math.max(minX - bufferDeg, -180.0), res)
        val hi = cell(math.min(maxY + bufferDeg, 90.0), math.min(maxX + bufferDeg, 180.0), res)
        val latLo = lo / LON_STRIDE; val lonLo = lo % LON_STRIDE
        val latHi = hi / LON_STRIDE; val lonHi = hi % LON_STRIDE
        val out = new Array[Long](((latHi - latLo + 1) * (lonHi - lonLo + 1)).toInt)
        var k = 0
        var i = latLo
        while (i <= latHi) {
          var j = lonLo
          while (j <= lonHi) { out(k) = i * LON_STRIDE + j; k += 1; j += 1 }
          i += 1
        }
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
