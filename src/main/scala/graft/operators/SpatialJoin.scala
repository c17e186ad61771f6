package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.GeoFunctions

/** Two-phase spatial join: coarse grid-cell equi-join prunes candidates,
  * exact point-in-polygon decides (SURVEY §2.3 J7+J8; reference design
  * `compiled-bookdown/03-geocode.Rmd:18-32`, code
  * `gps-analytics/src/pipeline/geocode_stop_locations.scala:46-88`).
  *
  * Scale shape: the points side stays partitioned and never shuffles — the
  * polygon side (thousands of admin shapes) explodes to covering cells and is
  * broadcast, so the join is a broadcast hash join on cell id followed by a
  * codegen filter. At 100 TB of points this is a map-only pass.
  */
object SpatialJoin {

  /** Geocode `points` against `polys`.
    *
    * @param points  any frame with double `latCol`/`lonCol`
    * @param polys   small dimension with `wktCol` (POLYGON/MULTIPOLYGON WKT)
    * @param res     grid resolution (cell side = 180/2^res degrees)
    * @param bufferDeg envelope buffer — the reference buffers by 0.005 deg
    *                  so border points aren't missed
    * @return points columns + polys columns (minus wkt), one row per
    *         containing polygon
    */
  def geocode(
      points: DataFrame,
      latCol: String,
      lonCol: String,
      polys: DataFrame,
      wktCol: String,
      res: Int = 10,
      bufferDeg: Double = 0.005): DataFrame = {
    val cells = polys.withColumn("__cell",
      explode(GeoFunctions.polygonCells(col(wktCol), res, bufferDeg)))
    points
      .withColumn("__cell", GeoFunctions.gridCell(col(latCol), col(lonCol), res))
      .join(broadcast(cells), Seq("__cell"))
      .where(GeoFunctions.stContains(col(wktCol), col(lonCol), col(latCol)))
      .drop("__cell", wktCol)
  }
}
