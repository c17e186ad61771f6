package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.GeoFunctions
import graft.operators.SpatialJoin

/** Geospatial operators (SURVEY §2.3 J7/J8, §2.10 F6/F7) as oracle-checked
  * queries.
  *
  * The testdata has no geometry, so coordinates are derived deterministically
  * from numeric columns with arithmetic both engines evaluate identically
  * (IEEE doubles, fmod/floor — no libm divergence except the haversine trig,
  * whose output is floor-bucketed to km). Polygons are literal WKT chosen
  * with 3-decimal vertices so 2-decimal-derived points never sit on an edge.
  */
object Geo {
  private def t(s: SparkSession, d: String, n: String): DataFrame = Tables(s, d, n)

  // triangle (lon lat), counter-clockwise
  private val TRI = "POLYGON ((10.137 20.711, 30.473 22.197, 18.731 40.899, 10.137 20.711))"

  private val RECTS = Seq(
    ("R1", -100.313, -50.137, -40.237, -10.411),
    ("R2", -49.731, 10.291, -40.237, -10.411),
    ("R3", 10.917, 80.313, 0.137, 35.411),
    ("R4", -20.317, 60.711, 40.137, 70.219))

  private def rectWkt(minX: Double, maxX: Double, minY: Double, maxY: Double): String =
    s"POLYGON (($minX $minY, $maxX $minY, $maxX $maxY, $minX $maxY, $minX $minY))"

  /** customer rows -> deterministic points; identical SQL in the oracles. */
  private def custPoints(s: SparkSession, d: String): DataFrame =
    t(s, d, "customer").select(
      col("c_custkey"),
      (col("c_acctbal") % 90.0).as("lat"),
      ((col("c_custkey") % 360) - 180).cast("double").as("lon"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Moran's I spatial autocorrelation (1950) — do neighboring grid
    // cells carry similar account balances? THE spatial-stats readout
    // over the q44 grid (near +1 = clustered, near 0 = random): rook
    // adjacency between 10°-cell means, I = (n/W)·Σ_adj c_i c_j / Σc_i²
    // with integer-centered cell means (c_i = m_i·n − Σm, the q456
    // trick — no float mean). Exact integer sums; ONE pinned ratio.
    // Scale: one scan to the bounded cell grid; adjacency is a keyed
    // self-join on shifted cell ids.
    "q516_morans_i" -> ((s, d) => {
      val cells = t(s, d, "customer")
        .select((col("c_acctbal") % 90.0).as("lat"),
          ((col("c_custkey") % 360) - 180).cast("double").as("lon"),
          floor(col("c_acctbal")).cast("long").as("bal"))
        .select(expr("cast(floor(lat / 10.0) as bigint)").as("gy"),
          expr("cast(floor(lon / 10.0) as bigint)").as("gx"),
          col("bal"))
        .groupBy("gx", "gy")
        .agg(expr("sum(bal) div count(1)").as("m"))
      val tot = cells.agg(count(lit(1)).as("nc"), sum("m").as("sm"))
      val c = cells.crossJoin(broadcast(tot))
        .select(col("gx"), col("gy"),
          (col("m") * col("nc") - col("sm")).as("c"), col("nc"))
        .persist() // both adjacency sides + the denominator read it
      val nbr = c.select(col("gx"), col("gy"), col("c"))
        .join(c.select(explode(expr(
            """array(named_struct('gx', gx + 1L, 'gy', gy),
                     named_struct('gx', gx - 1L, 'gy', gy),
                     named_struct('gx', gx, 'gy', gy + 1L),
                     named_struct('gx', gx, 'gy', gy - 1L))""")).as("k"),
            col("c").as("c2"))
          .select(col("k.gx").as("gx"), col("k.gy").as("gy"), col("c2")),
          Seq("gx", "gy"))
        .agg(count(lit(1)).as("w"), sum(col("c") * col("c2")).as("scc"))
      val den = c.agg(sum(col("c") * col("c")).as("sc2"),
        max("nc").as("nc"))
      nbr.crossJoin(den)
        .select(col("nc").as("n_cells"), col("w").as("w_pairs"),
          when(col("sc2") > 0L && col("w") > 0L,
            floor(col("nc").cast("double") * col("scc").cast("double") /
              (col("w").cast("double") * col("sc2").cast("double")) * 1e6)
              .cast("long"))
            .otherwise(lit(0L)).as("morans_i_e6"))
    }),

    // Haversine distance between derived nation coordinates, floor-bucketed
    // to km (trig last-ulp differences across engines can't flip a km).
    "q43_haversine" -> ((s, d) => {
      val n = t(s, d, "nation").select(
        col("n_nationkey").cast("long").as("k"),
        (col("n_nationkey") * 7.0 - 84.0).as("lat"),
        (col("n_nationkey") * 14.0 - 168.0).as("lon"))
      val a = n.select(col("k").as("k1"), col("lat").as("lat1"), col("lon").as("lon1"))
      val b = n.select(col("k").as("k2"), col("lat").as("lat2"), col("lon").as("lon2"))
      a.join(b, col("k1") < col("k2"))
        .select(col("k1"), col("k2"),
          floor(GeoFunctions.haversineMeters(
            col("lat1"), col("lon1"), col("lat2"), col("lon2")) / 1000)
            .cast("long").as("km"))
    }),

    // F6: native codegen grid-cell expression vs its closed-form SQL.
    "q44_grid_cell" -> ((s, d) => {
      custPoints(s, d)
        .select(col("c_custkey"), GeoFunctions.gridCell(col("lat"), col("lon"), 10).as("cell"))
    }),

    // F7/J8: exact point-in-polygon (ray cast) vs half-plane sign tests.
    "q45_point_in_triangle" -> ((s, d) => {
      t(s, d, "customer")
        .select(col("c_custkey"),
          (col("c_custkey") % 40.0).as("lon"),
          ((col("c_acctbal") % 45.0) + 20.0).as("lat"))
        .where(GeoFunctions.stContains(lit(TRI), col("lon"), col("lat")))
        .select("c_custkey")
    }),

    // J7+J8: full two-phase spatial join (polygon cells explode -> broadcast
    // equi-join on cell -> exact refine) against rectangle dimensions.
    "q46_spatial_join" -> ((s, d) => {
      import s.implicits._
      val polys = RECTS.map { case (id, minX, maxX, minY, maxY) =>
        (id, rectWkt(minX, maxX, minY, maxY))
      }.toDF("geom_id", "wkt")
      SpatialJoin.geocode(custPoints(s, d), "lat", "lon", polys, "wkt", res = 6)
        .select("c_custkey", "geom_id")
    }),

    // Point-to-point radius self-join via k-ring candidate cells + exact
    // planar refine — the near-point search the envelope/polygon join
    // can't express. The brute-force oracle proves candidate completeness:
    // any pair the ring join missed would fail the row-count match.
    "q153_radius_join" -> ((s, d) => {
      SpatialJoin.radiusSelfJoin(custPoints(s, d), "c_custkey",
        "lat", "lon", radiusDeg = 2.0, res = 6)
    }),

    // k-nearest-neighbor geo join: the 3 closest customer points to each
    // of the 25 anchor sites (q43's derived nation coordinates), by
    // squared-degree distance with id tie-break. Scale shape: anchors
    // are a broadcast dim fanned onto one linear scan of the point set,
    // and the per-anchor top-3 runs through the custom bounded-heap
    // operator (TopKPerKey, q95's plan): partial map-side heaps, ≤ k
    // rows per (anchor, partition) shuffle, no sort and no per-anchor
    // window over the full candidate stream.
    "q290_geo_knn" -> ((s, d) => {
      val anchors = broadcast(t(s, d, "nation").select(
        col("n_nationkey").cast("long").as("a_id"),
        (col("n_nationkey") * 7.0 - 84.0).as("a_lat"),
        (col("n_nationkey") * 14.0 - 168.0).as("a_lon")))
      val cand = custPoints(s, d).crossJoin(anchors)
        .select(col("a_id"), col("c_custkey"),
          ((col("lat") - col("a_lat")) * (col("lat") - col("a_lat")) +
            (col("lon") - col("a_lon")) * (col("lon") - col("a_lon"))).as("d2"))
      graft.plans.TopKPerKey(cand, Seq("a_id"),
        Seq(asc("d2"), asc("c_custkey")), 3)
    }))

  private val havSql =
    """2*6371000.0*asin(sqrt(
        sin(radians(b.lat-a.lat)/2)*sin(radians(b.lat-a.lat)/2)
        + cos(radians(a.lat))*cos(radians(b.lat))
          * sin(radians(b.lon-a.lon)/2)*sin(radians(b.lon-a.lon)/2)))"""

  private def rectOracle: String = RECTS.map { case (id, minX, maxX, minY, maxY) =>
    s"""SELECT c_custkey, '$id' AS geom_id FROM pts
        WHERE lon > $minX AND lon < $maxX AND lat > $minY AND lat < $maxY"""
  }.mkString(" UNION ALL ")

  val oracles: Map[String, String] = Map(
    "q516_morans_i" ->
      """WITH pts AS (
           SELECT (c_acctbal % 90.0) AS lat,
             CAST((c_custkey % 360) - 180 AS DOUBLE) AS lon,
             CAST(floor(c_acctbal) AS BIGINT) AS bal
           FROM customer),
         cells AS (
           SELECT CAST(floor(lon / 10.0) AS BIGINT) AS gx,
             CAST(floor(lat / 10.0) AS BIGINT) AS gy,
             CAST(sum(bal) AS BIGINT) // count(*) AS m
           FROM pts GROUP BY 1, 2),
         tot AS (
           SELECT count(*) AS nc, CAST(sum(m) AS BIGINT) AS sm
           FROM cells),
         c AS (SELECT gx, gy, m * nc - sm AS c, nc FROM cells, tot),
         nbrs AS (
           SELECT a.c AS c1, b.c AS c2
           FROM c a JOIN c b
             ON (abs(a.gx - b.gx) = 1 AND a.gy = b.gy)
             OR (a.gx = b.gx AND abs(a.gy - b.gy) = 1)),
         ag AS (
           SELECT count(*) AS w, CAST(sum(c1 * c2) AS BIGINT) AS scc
           FROM nbrs),
         den AS (
           SELECT CAST(sum(c.c * c.c) AS BIGINT) AS sc2, max(nc) AS nc
           FROM c)
         SELECT nc AS n_cells, w AS w_pairs,
           CASE WHEN sc2 > 0 AND w > 0
             THEN CAST(floor(CAST(nc AS DOUBLE) * CAST(scc AS DOUBLE)
               / (CAST(w AS DOUBLE) * CAST(sc2 AS DOUBLE))
               * 1000000.0) AS BIGINT)
             ELSE 0 END AS morans_i_e6
         FROM ag, den""",

    "q153_radius_join" ->
      """WITH p AS (
           SELECT c_custkey AS id, c_acctbal % 90.0 AS lat,
             CAST((c_custkey % 360) - 180 AS DOUBLE) AS lon
           FROM customer)
         SELECT a.id AS a_id, a.lat AS a_lat, a.lon AS a_lon,
           b.id AS b_id, b.lat AS b_lat, b.lon AS b_lon,
           (a.lat-b.lat)*(a.lat-b.lat) + (a.lon-b.lon)*(a.lon-b.lon) AS d2
         FROM p a JOIN p b ON a.id < b.id
         WHERE (a.lat-b.lat)*(a.lat-b.lat) + (a.lon-b.lon)*(a.lon-b.lon) <= 4.0""",
    "q43_haversine" ->
      s"""WITH n AS (SELECT CAST(n_nationkey AS BIGINT) AS k,
            n_nationkey*7.0-84.0 AS lat, n_nationkey*14.0-168.0 AS lon FROM nation)
         SELECT a.k AS k1, b.k AS k2,
           CAST(floor(($havSql)/1000) AS BIGINT) AS km
         FROM n a JOIN n b ON a.k < b.k""",
    "q44_grid_cell" ->
      """SELECT c_custkey,
           least(CAST(floor((c_acctbal % 90.0 + 90.0)/0.17578125) AS BIGINT), 1023)*4194304
           + least(CAST(floor((CAST((c_custkey % 360) - 180 AS DOUBLE) + 180.0)/0.17578125) AS BIGINT), 2047)
           AS cell
         FROM customer""",
    "q45_point_in_triangle" -> {
      val (ax, ay) = (10.137, 20.711)
      val (bx, by) = (30.473, 22.197)
      val (cx, cy) = (18.731, 40.899)
      s"""SELECT c_custkey FROM
           (SELECT c_custkey, c_custkey % 40.0 AS x, (c_acctbal % 45.0) + 20.0 AS y
            FROM customer)
         WHERE ($bx - $ax)*(y - $ay) - ($by - $ay)*(x - $ax) > 0
           AND ($cx - $bx)*(y - $by) - ($cy - $by)*(x - $bx) > 0
           AND ($ax - $cx)*(y - $cy) - ($ay - $cy)*(x - $cx) > 0"""
    },
    "q46_spatial_join" ->
      s"""WITH pts AS (SELECT c_custkey, c_acctbal % 90.0 AS lat,
            CAST((c_custkey % 360) - 180 AS DOUBLE) AS lon FROM customer)
         $rectOracle""",
    "q290_geo_knn" ->
      """WITH a AS (
           SELECT CAST(n_nationkey AS BIGINT) AS a_id,
             n_nationkey * 7.0 - 84.0 AS a_lat,
             n_nationkey * 14.0 - 168.0 AS a_lon
           FROM nation),
         p AS (
           SELECT c_custkey, c_acctbal % 90.0 AS lat,
             CAST((c_custkey % 360) - 180 AS DOUBLE) AS lon
           FROM customer),
         cand AS (
           SELECT a_id, c_custkey,
             (lat - a_lat) * (lat - a_lat)
               + (lon - a_lon) * (lon - a_lon) AS d2
           FROM p CROSS JOIN a),
         r AS (
           SELECT a_id, c_custkey, d2,
             row_number() OVER (PARTITION BY a_id
               ORDER BY d2, c_custkey) AS rnk
           FROM cand)
         SELECT a_id, c_custkey, d2 FROM r WHERE rnk <= 3""")
}
