package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, GraftSqlBridge, SparkSession}
import org.apache.spark.sql.execution.SparkStrategy
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, BindReferences, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}

/** Whole-operator Catalyst extension: top-k rows per key.
  *
  * The stock plan for "top k per key" is `row_number() OVER (PARTITION BY
  * key ORDER BY ord) <= k`, which shuffles everything and fully sorts each
  * key's rows. This operator is the aggregation-shaped alternative: a
  * map-side pass keeps a bounded heap per key (like partial aggregation),
  * the shuffle then carries at most `k` rows per (key, input partition),
  * and a final heap merge per key emits the answer — no sort of the full
  * data, shuffle volume bounded by k * partitions * keys instead of the
  * table size. At 100 TB with hot keys this is the difference between a
  * spill-heavy sort and a streaming pass.
  *
  * Pieces: `TopKPerKeyNode` (logical), `TopKStrategy` (planner, registered
  * via `SparkSessionExtensions.injectPlannerStrategy`), `TopKPerKeyExec`
  * (physical, partial and final modes — `EnsureRequirements` inserts the
  * exchange between them because the final mode declares a
  * `ClusteredDistribution` requirement).
  *
  * The `order` must be a total order (include a tie-break column) for
  * deterministic results.
  */
case class TopKPerKeyNode(
    keyExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): LogicalPlan =
    copy(child = newChild)
}

class TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyNode(keys, order, k, child) =>
      val partialExec: SparkPlan =
        TopKPerKeyExec(keys, order, k, partial = true, planLater(child))
      TopKPerKeyExec(keys, order, k, partial = false, partialExec) :: Nil
    case _ => Nil
  }
}

case class TopKPerKeyExec(
    keyExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    partial: Boolean,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(keyExprs) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    // Bind to ordinals and canonicalize on the driver: expressions obtained
    // from the Column API can carry tree tags referencing non-serializable
    // internal ColumnNode objects; canonicalized trees are clean.
    val boundKeys = keyExprs
      .map(BindReferences.bindReference(_, child.output).canonicalized)
    val boundOrder = order
      .map(BindReferences.bindReference(_, child.output).canonicalized
        .asInstanceOf[SortOrder])
    val limit = k
    child.execute().mapPartitions { it =>
      val keyProj = UnsafeProjection.create(boundKeys)
      val rowOrdering = GenerateOrdering.generate(boundOrder)
      // max-heap on the *worst* kept row so eviction is O(log k)
      val heaps = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]()
      val reversed = rowOrdering.reversed()
      while (it.hasNext) {
        val row = it.next()
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = new java.util.PriorityQueue[InternalRow](limit + 1, reversed)
          heaps.put(key.copy(), heap)
        }
        if (heap.size < limit) {
          heap.add(row.copy())
        } else if (rowOrdering.compare(row, heap.peek()) < 0) {
          heap.poll()
          heap.add(row.copy())
        }
      }
      import scala.jdk.CollectionConverters._
      heaps.values().iterator().asScala.flatMap(_.iterator().asScala)
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): SparkPlan =
    copy(child = newChild)
}

object TopKPerKey {

  /** Top `k` rows per `keyCols` group in the order given by `orderCols`
    * (include a tie-break for determinism). Output rows are unordered
    * within groups, like any aggregate.
    */
  def apply(df: DataFrame, keyCols: Seq[String], orderCols: Seq[Column], k: Int): DataFrame = {
    val spark = df.sparkSession
    val keyExprs: Seq[Expression] =
      keyCols.map(c => GraftSqlBridge.expression(df.col(c)))
    val order: Seq[SortOrder] = orderCols.map { c =>
      GraftSqlBridge.expression(c) match {
        case so: SortOrder => so
        case e => SortOrder(e, org.apache.spark.sql.catalyst.expressions.Ascending)
      }
    }
    GraftSqlBridge.ofRows(spark,
      TopKPerKeyNode(keyExprs, order, k, GraftSqlBridge.analyzed(df)))
  }
}
