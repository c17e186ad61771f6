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

  /** Point-to-point radius self-join (all pairs within `radiusDeg`, planar
    * degree metric): each left point keys on its own grid cell; each right
    * point explodes to its 3x3 k-ring of neighbor cells; the equi-join on
    * cell id meets every true pair EXACTLY once (the left point's cell is
    * in the right point's ring iff their cell indices differ by <= 1 on
    * each axis, which `radiusDeg <= cellSize` guarantees for true pairs),
    * so no distinct pass is needed. Exact refine on squared degree
    * distance — pure IEEE arithmetic, so oracle parity is bit-exact with
    * no trig involved; production swaps `GeoFunctions.haversineMeters`
    * into the refine when a metric radius is wanted.
    *
    * Ring cells that fall off the grid (poles, antimeridian columns) are
    * filtered in the generator, not clamped: a clamped id would alias a
    * real cell and double-count pairs there.
    *
    * Scale shape: one shuffle on cell id for each side (9x generator
    * fan-out on the right, map-side), per-cell fan-in bounded by point
    * density x 9 — the all-pairs quadratic never materializes.
    *
    * @return (left columns prefixed a_, right columns prefixed b_, d2)
    *         for pairs with `a.idCol < b.idCol` and d2 <= radiusDeg^2
    */
  def radiusSelfJoin(
      points: DataFrame,
      idCol: String,
      latCol: String,
      lonCol: String,
      radiusDeg: Double,
      res: Int): DataFrame = {
    val cellSize = graft.functions.Grid.cellSizeDeg(res)
    require(radiusDeg <= cellSize,
      s"radiusDeg=$radiusDeg exceeds cell size $cellSize at res=$res: " +
        "true pairs could span non-adjacent cells and be missed")
    val stride = graft.functions.Grid.LON_STRIDE
    val maxLat = (1L << res) - 1
    val maxLon = (2L << res) - 1
    val a = points.select(
      col(idCol).as("a_id"), col(latCol).as("a_lat"), col(lonCol).as("a_lon"),
      GeoFunctions.gridCell(col(latCol), col(lonCol), res).as("__cell"))
    val ring = {
      val cell = GeoFunctions.gridCell(col(latCol), col(lonCol), res)
      // stride is 2^22, so the (latIdx, lonIdx) split is exact bit surgery.
      val latIdx = shiftright(cell, 22)
      val lonIdx = cell.bitwiseAND(lit(stride - 1))
      val neighbors = for (dy <- -1 to 1; dx <- -1 to 1) yield
        when(latIdx + dy >= 0 && latIdx + dy <= maxLat &&
             lonIdx + dx >= 0 && lonIdx + dx <= maxLon,
          (latIdx + dy) * stride + (lonIdx + dx))
      array(neighbors: _*)
    }
    val b = points.select(
      col(idCol).as("b_id"), col(latCol).as("b_lat"), col(lonCol).as("b_lon"),
      explode(filter(ring, c => c.isNotNull)).as("__cell"))
    val d2 = (col("a_lat") - col("b_lat")) * (col("a_lat") - col("b_lat")) +
      (col("a_lon") - col("b_lon")) * (col("a_lon") - col("b_lon"))
    a.join(b, Seq("__cell"))
      .where(col("a_id") < col("b_id"))
      .withColumn("d2", d2)
      .where(col("d2") <= lit(radiusDeg * radiusDeg))
      .drop("__cell")
  }
}
