package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, Window}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: the stock top-k-per-key idiom
  *
  * {{{
  *   df.withColumn("rn", row_number().over(Window.partitionBy(k).orderBy(o)))
  *     .where($"rn" <= k)
  *     .drop("rn")
  * }}}
  *
  * is rewritten to the `TopKPerKeyNode` bounded-heap operator whenever the
  * rank column itself is dropped by the enclosing projection. The stock
  * plan shuffles EVERY row and fully sorts each key's partition; the
  * rewritten plan keeps a k-bounded heap per key on the map side, shuffles
  * at most k rows per (key, partition), and merges heaps — at 100 TB the
  * difference between a spill-heavy sort and a streaming pass (see
  * `TopKPerKey`'s scaladoc).
  *
  * Fires only when the rewrite is airtight:
  *  - the Window computes exactly ONE expression: `row_number()` over a
  *    non-empty PARTITION BY with the default running-row frame;
  *  - the filter's rank conjunct is `rn <= k` / `rn < k` / `rn = 1` (any
  *    literal-comparison orientation); remaining conjuncts must not touch
  *    `rn` and are re-applied above the operator (they commute: rank is
  *    computed before the filter either way);
  *  - no surviving column references `rn` (the projection drops it) — the
  *    operator does not materialize ranks.
  *
  * Like the window form itself, results are deterministic only under a
  * total order (tie-break column): with ties, both plans keep an
  * arbitrary-but-valid k-subset.
  *
  * OPT-IN (`spark.sql.graft.topkRewrite=true`, default off): whether the
  * heap beats the sort depends on rows-per-key, which the optimizer
  * cannot see without column stats. With heavy fan-in per key (the
  * group-sampling shape) the heap caps shuffle volume at k per (key,
  * partition) and wins big; at ~k rows per key (e.g. the Ed-Join prefix
  * cut: 1-2 grams per string id) the per-key heap machinery loses to the
  * codegen sort — measured 8x WORSE on q163 when this fired untargeted.
  * So the rewrite is a per-workload switch; plans that know their
  * fan-in call `TopKPerKey(...)` directly (q95/q112/q134/q189/q202).
  */
object WindowTopKToTopKPerKey extends Rule[LogicalPlan] with PredicateHelper {

  val ConfKey = "spark.sql.graft.topkRewrite"

  private val runningRowFrame =
    SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow)

  /** k such that `cond` ≡ rank(rn) <= k, for the shapes we accept. */
  private def limitOf(cond: Expression, rn: Attribute): Option[Int] = cond match {
    case LessThanOrEqual(a: Attribute, IntegerLiteral(k)) if a.semanticEquals(rn) => Some(k)
    case LessThan(a: Attribute, IntegerLiteral(k)) if a.semanticEquals(rn) => Some(k - 1)
    case EqualTo(a: Attribute, IntegerLiteral(1)) if a.semanticEquals(rn) => Some(1)
    case EqualTo(IntegerLiteral(1), a: Attribute) if a.semanticEquals(rn) => Some(1)
    case GreaterThanOrEqual(IntegerLiteral(k), a: Attribute) if a.semanticEquals(rn) => Some(k)
    case GreaterThan(IntegerLiteral(k), a: Attribute) if a.semanticEquals(rn) => Some(k - 1)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!conf.getConfString(ConfKey, "false").toBoolean) plan
    else plan.transformUp {
    case p @ Project(projList,
        Filter(cond,
          Window(Seq(al @ Alias(WindowExpression(RowNumber(), spec), _)),
            part, ord, child, _)))
        if part.nonEmpty && ord.nonEmpty &&
          spec.frameSpecification == runningRowFrame =>
      val rn = al.toAttribute
      val conjuncts = splitConjunctivePredicates(cond)
      val (rankConds, rest) = conjuncts.partition(c => limitOf(c, rn).isDefined)
      val eligible = rankConds.size == 1 &&
        rest.forall(!_.references.contains(rn)) &&
        projList.forall(!_.references.contains(rn))
      val k = rankConds.headOption.flatMap(limitOf(_, rn)).getOrElse(0)
      if (eligible && k > 0) {
        val topk = TopKPerKeyNode(part, ord, k, child)
        Project(projList, if (rest.isEmpty) topk else Filter(rest.reduce(And), topk))
      } else p
  }
}
