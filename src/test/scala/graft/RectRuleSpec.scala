package graft

import org.apache.spark.sql.functions._
import graft.functions.GeoFunctions
import graft.plans.RectContainsToRange

/** The rectangle-contains optimizer rule: literal axis-aligned rectangles
  * become range predicates (codegen + parquet pushdown) with ray-cast edge
  * semantics preserved ([minX,maxX) x [minY,maxY)).
  */
class RectRuleSpec extends SparkSpec {

  val rect = "POLYGON ((10 20, 30 20, 30 40, 10 40, 10 20))"
  val tri = "POLYGON ((10 20, 30 20, 20 40, 10 20))"

  test("rectOf recognizes rectangles in any ring order, rejects others") {
    assert(RectContainsToRange.rectOf(rect).contains((10.0, 20.0, 30.0, 40.0)))
    // clockwise ring
    assert(RectContainsToRange.rectOf(
      "POLYGON ((10 20, 10 40, 30 40, 30 20, 10 20))").contains((10.0, 20.0, 30.0, 40.0)))
    assert(RectContainsToRange.rectOf(tri).isEmpty)
    // axis-aligned hexagon (L-shape) is not a rectangle
    assert(RectContainsToRange.rectOf(
      "POLYGON ((0 0, 10 0, 10 4, 4 4, 4 10, 0 10, 0 0))").isEmpty)
  }

  test("literal rect filter is rewritten out of the plan; triangle is not") {
    import spark.implicits._
    // parquet-backed so ConvertToLocalRelation can't pre-evaluate the filter
    val dir = java.nio.file.Files.createTempDirectory("rect_plan").toString + "/pts"
    Seq((1L, 15.0, 25.0)).toDF("id", "lon", "lat").write.parquet(dir)
    val pts = spark.read.parquet(dir)
    val rectPlan = pts.where(GeoFunctions.stContains(lit(rect), col("lon"), col("lat")))
      .queryExecution.optimizedPlan.toString
    assert(!rectPlan.contains("graft_st_contains"), rectPlan)
    val triPlan = pts.where(GeoFunctions.stContains(lit(tri), col("lon"), col("lat")))
      .queryExecution.optimizedPlan.toString
    assert(triPlan.contains("graft_st_contains"), triPlan)
  }

  test("rewrite preserves ray-cast semantics including edges") {
    import spark.implicits._
    val pts = Seq(
      (1L, 15.0, 25.0), // interior
      (2L, 10.0, 25.0), // left edge -> in
      (3L, 30.0, 25.0), // right edge -> out
      (4L, 15.0, 20.0), // bottom edge -> in
      (5L, 15.0, 40.0), // top edge -> out
      (6L, 10.0, 20.0), // bottom-left corner -> in
      (7L, 5.0, 25.0) // outside
    ).toDF("id", "lon", "lat")
    val got = pts.where(GeoFunctions.stContains(lit(rect), col("lon"), col("lat")))
      .select("id").as[Long].collect().toSet
    assert(got == Set(1L, 2L, 4L, 6L))
    // the pure ray cast agrees on every probe
    val g = graft.functions.Wkt.parse(rect).get
    val expected = Seq((1L, 15.0, 25.0), (2L, 10.0, 25.0), (3L, 30.0, 25.0),
      (4L, 15.0, 20.0), (5L, 15.0, 40.0), (6L, 10.0, 20.0), (7L, 5.0, 25.0))
      .filter { case (_, x, y) => g.contains(x, y) }.map(_._1).toSet
    assert(got == expected)
  }

  test("rewritten predicate pushes into the parquet scan") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("rect_push").toString + "/pts"
    Seq((1L, 15.0, 25.0), (2L, 50.0, 50.0)).toDF("id", "lon", "lat")
      .write.parquet(dir)
    val p = spark.read.parquet(dir)
      .where(GeoFunctions.stContains(lit(rect), col("lon"), col("lat")))
      .queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters: [IsNotNull(lon)") ||
      p.contains("GreaterThanOrEqual(lon,10.0)"), p)
  }
}
