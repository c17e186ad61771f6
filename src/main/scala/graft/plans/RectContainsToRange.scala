package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String
import graft.functions.{StContainsExpr, Wkt}

/** Optimizer rule: `graft_st_contains(<literal axis-aligned rectangle>,
  * lon, lat)` becomes plain range predicates.
  *
  * This is a real plan improvement, not sugar: the ray-cast expression is a
  * black box to Catalyst (CodegenFallback, no pushdown), while the rewritten
  * conjunction participates in whole-stage codegen AND pushes into the
  * parquet scan (`PushedFilters`), so a geofence query over 100 TB prunes
  * row groups instead of decoding every point. Admin boxes / tile bounds /
  * bbox pre-filters are literal rectangles in practice.
  *
  * Semantics preserved exactly, including edges: the even-odd ray cast on an
  * axis-aligned ring evaluates to the half-open box
  * `[minX, maxX) x [minY, maxY)` (left/bottom edges inside, right/top
  * outside), which is what we emit.
  */
object RectContainsToRange extends Rule[LogicalPlan] {

  /** Returns (minX, minY, maxX, maxY) iff the WKT is a single-ring
    * axis-aligned rectangle.
    */
  private[graft] def rectOf(wkt: String): Option[(Double, Double, Double, Double)] =
    Wkt.parse(wkt) match {
      case Some(g) if g.polys.length == 1 && g.polys(0).holes.isEmpty =>
        val r = g.polys(0).outer
        // closed 5-point ring, consecutive edges strictly axis-aligned
        val closed = r.size == 5 &&
          r.xs(0) == r.xs(4) && r.ys(0) == r.ys(4)
        val axisAligned = closed && (0 until 4).forall { i =>
          (r.xs(i) == r.xs(i + 1)) != (r.ys(i) == r.ys(i + 1))
        }
        if (axisAligned) {
          val (minX, minY, maxX, maxY) = g.envelope
          // the four corners must be exactly the envelope corners
          val corners = (0 until 4).map(i => (r.xs(i), r.ys(i))).toSet
          if (corners == Set((minX, minY), (maxX, minY), (maxX, maxY), (minX, maxY)))
            Some((minX, minY, maxX, maxY))
          else None
        } else None
      case _ => None
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case e @ StContainsExpr(Literal(wkt: UTF8String, StringType), lonE, latE) =>
      rectOf(wkt.toString) match {
        case Some((minX, minY, maxX, maxY)) =>
          And(
            And(GreaterThanOrEqual(lonE, Literal(minX)), LessThan(lonE, Literal(maxX))),
            And(GreaterThanOrEqual(latE, Literal(minY)), LessThan(latE, Literal(maxY))))
        case None => e
      }
  }
}
