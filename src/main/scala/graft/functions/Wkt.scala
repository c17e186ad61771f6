package graft.functions

/** Minimal WKT geometry support (no external geo jars in this build).
  *
  * The reference parses admin polygons from WKT CSV via Sedona
  * `ST_GeomFromText` (`gps-analytics/src/pipeline/geocode_stop_locations.scala:31`)
  * and tests membership with `ST_Intersects(point, polygon)`
  * (`geocode_stop_locations.scala:85-88`). Here WKT stays a plain string
  * column and membership is an even-odd ray cast — the same two-phase
  * contract: coarse grid cells prune candidates, the exact test decides.
  *
  * Coordinates follow WKT convention: `POLYGON ((x y, ...))` with x=lon,
  * y=lat. Supports POLYGON with holes and MULTIPOLYGON.
  */
object Wkt {

  /** One ring: closed sequence of (x, y). */
  final case class Ring(xs: Array[Double], ys: Array[Double]) {
    def size: Int = xs.length
  }

  /** Polygon = outer ring + holes. */
  final case class Poly(outer: Ring, holes: Array[Ring])

  final case class Geom(polys: Array[Poly]) {
    lazy val envelope: (Double, Double, Double, Double) = { // minX, minY, maxX, maxY
      var minX = Double.MaxValue; var minY = Double.MaxValue
      var maxX = Double.MinValue; var maxY = Double.MinValue
      for (p <- polys; r = p.outer; i <- 0 until r.size) {
        if (r.xs(i) < minX) minX = r.xs(i)
        if (r.xs(i) > maxX) maxX = r.xs(i)
        if (r.ys(i) < minY) minY = r.ys(i)
        if (r.ys(i) > maxY) maxY = r.ys(i)
      }
      (minX, minY, maxX, maxY)
    }

    /** Even-odd ray cast, holes subtract. Boundary behavior is half-open
      * (standard crossing rule) — callers must not depend on exact-edge hits.
      */
    def contains(x: Double, y: Double): Boolean =
      polys.exists { p =>
        inRing(p.outer, x, y) && !p.holes.exists(inRing(_, x, y))
      }

    private def inRing(r: Ring, x: Double, y: Double): Boolean = {
      var inside = false
      var j = r.size - 1
      var i = 0
      while (i < r.size) {
        val xi = r.xs(i); val yi = r.ys(i)
        val xj = r.xs(j); val yj = r.ys(j)
        if (((yi > y) != (yj > y)) &&
            (x < (xj - xi) * (y - yi) / (yj - yi) + xi)) inside = !inside
        j = i
        i += 1
      }
      inside
    }
  }

  /** Parse POLYGON/MULTIPOLYGON/POINT WKT. Returns None on malformed input
    * (callers surface null, matching SQL null semantics).
    */
  def parse(wkt: String): Option[Geom] = {
    if (wkt == null) return None
    val s = wkt.trim
    val upper = s.toUpperCase
    try {
      if (upper.startsWith("POLYGON")) {
        parseRings(s.substring(s.indexOf('('))).map(rs => Geom(Array(toPoly(rs))))
      } else if (upper.startsWith("MULTIPOLYGON")) {
        val body = s.substring(s.indexOf('('))
        parseMulti(body).map(ps => Geom(ps.toArray))
      } else if (upper.startsWith("POINT")) {
        val inner = s.substring(s.indexOf('(') + 1, s.lastIndexOf(')')).trim
        val parts = inner.split("\\s+")
        val x = parts(0).toDouble; val y = parts(1).toDouble
        Some(Geom(Array(Poly(Ring(Array(x), Array(y)), Array.empty))))
      } else None
    } catch { case _: Exception => None }
  }

  private def toPoly(rings: Seq[Ring]): Poly =
    Poly(rings.head, rings.tail.toArray)

  /** Parse `((x y, ...), (hole...))` into rings. */
  private def parseRings(body: String): Option[Seq[Ring]] = {
    val rings = collection.mutable.ArrayBuffer.empty[Ring]
    var depth = 0
    var start = -1
    var i = 0
    while (i < body.length) {
      val c = body.charAt(i)
      if (c == '(') { depth += 1; if (depth == 2) start = i + 1 }
      else if (c == ')') {
        if (depth == 2 && start >= 0) {
          rings += parseRing(body.substring(start, i))
          start = -1
        }
        depth -= 1
      }
      i += 1
    }
    if (rings.isEmpty) None else Some(rings.toSeq)
  }

  /** Parse `(((...)), ((...)))` into polygons. */
  private def parseMulti(body: String): Option[Seq[Poly]] = {
    val polys = collection.mutable.ArrayBuffer.empty[Poly]
    var depth = 0
    var start = -1
    var i = 0
    while (i < body.length) {
      val c = body.charAt(i)
      if (c == '(') { depth += 1; if (depth == 2) start = i }
      else if (c == ')') {
        if (depth == 2 && start >= 0) {
          parseRings(body.substring(start, i + 1)).foreach(rs => polys += toPoly(rs))
          start = -1
        }
        depth -= 1
      }
      i += 1
    }
    if (polys.isEmpty) None else Some(polys.toSeq)
  }

  private def parseRing(s: String): Ring = {
    val pts = s.split(",").map(_.trim).filter(_.nonEmpty)
    val xs = new Array[Double](pts.length)
    val ys = new Array[Double](pts.length)
    var i = 0
    while (i < pts.length) {
      val p = pts(i).split("\\s+")
      xs(i) = p(0).toDouble
      ys(i) = p(1).toDouble
      i += 1
    }
    Ring(xs, ys)
  }
}
