package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level geo API (requires `GraftExtensions` registered on the
  * session — see `graft.plans.GraftExtensions`).
  */
object GeoFunctions {

  val EarthRadiusM = 6371000.0

  // casts are explicit: the expressions skip Catalyst's implicit type
  // coercion (AbstractDataType is private[sql] in Spark 4)
  def gridCell(lat: Column, lon: Column, res: Int): Column =
    call_function("graft_grid_cell", lat.cast("double"), lon.cast("double"), lit(res))

  def polygonCells(wkt: Column, res: Int, bufferDeg: Double = 0.005): Column =
    call_function("graft_polygon_cells", wkt.cast("string"), lit(res), lit(bufferDeg))

  def stContains(wkt: Column, lon: Column, lat: Column): Column =
    call_function("graft_st_contains", wkt.cast("string"), lon.cast("double"), lat.cast("double"))

  /** Great-circle distance in meters, composed from codegen built-ins (sin,
    * cos, asin, sqrt stay inside whole-stage codegen — no UDF boundary).
    * Same formula the reference's Infostop clustering uses
    * (`compiled-bookdown/04-stops.Rmd:16-31`).
    */
  def haversineMeters(lat1: Column, lon1: Column, lat2: Column, lon2: Column): Column = {
    val dLat = radians(lat2 - lat1) / 2
    val dLon = radians(lon2 - lon1) / 2
    val a = sin(dLat) * sin(dLat) +
      cos(radians(lat1)) * cos(radians(lat2)) * sin(dLon) * sin(dLon)
    lit(2 * EarthRadiusM) * asin(sqrt(a))
  }
}
