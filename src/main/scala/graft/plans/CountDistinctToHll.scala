package graft.plans

import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, HyperLogLogPlusPlus}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: rewrite exact `count(DISTINCT x)` aggregates to
  * HyperLogLog++ (`approx_count_distinct`) estimates.
  *
  * Exact distinct-counting is one of the few aggregations that gets WORSE
  * with scale no matter the plan: Spark plans it as an Expand + double
  * shuffle (or an OFF-heap sort-dedup per group), and the intermediate
  * state is proportional to the number of distinct values — at 100 TB the
  * NDV state is itself terabytes. The HLL++ sketch is fixed-size (~1.5 KB
  * at the default 5% rsd), map-side combinable, and one shuffle; swapping
  * it in is the standard first move when an exact-NDV dashboard query
  * falls over (the engine's q99 band-checks this exact substitution).
  *
  * OPT-IN (`spark.sql.graft.approxDistinct=true`, default off) because it
  * trades CORRECTNESS for scale, not just time — callers must accept the
  * rsd error band (`spark.sql.graft.approxDistinctRsd`, default 0.05).
  * The rewrite preserves aliases (result columns keep their names), keeps
  * any FILTER clause, and leaves multi-argument distinct counts
  * (`count(DISTINCT a, b)`) untouched — HLL++ is single-expression;
  * hashing a struct of both is a semantic choice the caller should make
  * explicitly.
  */
object CountDistinctToHll extends Rule[LogicalPlan] {

  val ConfKey = "spark.sql.graft.approxDistinct"
  val RsdKey = "spark.sql.graft.approxDistinctRsd"

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!conf.getConfString(ConfKey, "false").toBoolean) plan
    else {
      val rsd = conf.getConfString(RsdKey, "0.05").toDouble
      plan.transformUp {
        case a: Aggregate => a.transformExpressions {
          case AggregateExpression(Count(Seq(child)), mode, true, filter, _) =>
            AggregateExpression(
              HyperLogLogPlusPlus(child, rsd), mode, isDistinct = false, filter)
        }
      }
    }
}
