package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeSet, BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{Distribution, OrderedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Whole-operator Catalyst extension: the distributed prefix scan
  * (running aggregates / lag over a global or per-key total order).
  *
  * `agg(x) OVER (ORDER BY ...)` funnels the whole table through ONE task,
  * and `OVER (PARTITION BY lowCardKey ORDER BY ...)` through #keys tasks —
  * the classic scale killers a two-phase scan replaces: (1) range-sort by
  * (key, order) so every partition works and keys occupy contiguous
  * partition RANGES; fold each (partition, key) run's monoid total in one
  * streaming pass; (2) exclusive-prefix-combine the per-run totals on the
  * driver (bounded: ≤ #partitions + #distinctKeys rows) and broadcast each
  * (partition, key) its offset; a second streaming pass emits the running
  * values. Results are identical to the window form for a total ordering.
  *
  * This is the physical-plan form of what used to be an RDD-boundary
  * operator: UnsafeRow in/out (no Row boxing), visible in `explain` (so
  * plan-shape tests see through it), and it DECLARES its output ordering
  * and partitioning — a downstream aggregate or join on the same keys
  * reuses the range shuffle instead of re-shuffling.
  *
  * Pieces follow `plans/TopKPerKey.scala`: `PrefixScanNode` (logical),
  * `PrefixScanStrategy` (planner rule, registered via
  * `SparkSessionExtensions.injectPlannerStrategy`), `PrefixScanExec`
  * (physical; `EnsureRequirements` inserts the range exchange + sort
  * because the node declares an `OrderedDistribution` requirement).
  * The public API stays `graft.operators.PrefixScan`.
  */
case class PrefixScanNode(
    keyExprs: Seq[Expression],
    order: Seq[SortOrder],
    scanAttrs: Seq[Attribute], // pre-created so exprIds survive transforms
    valueExprs: Seq[Expression], // Literal(0L) where the op reads no value
    ops: Seq[String],
    inclusives: Seq[Boolean],
    params: Seq[Long],
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output ++ scanAttrs
  override def producedAttributes: AttributeSet = AttributeSet(scanAttrs)
  override protected def withNewChildInternal(newChild: LogicalPlan): LogicalPlan =
    copy(child = newChild)
}

class PrefixScanStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case PrefixScanNode(keys, order, attrs, values, ops, incl, params, child) =>
      PrefixScanExec(keys, order, attrs, values, ops, incl, params,
        planLater(child)) :: Nil
    case _ => Nil
  }
}

/** One scan op's monoid on a Long state vector with an EXPLICIT set flag in
  * slot 0 (no sentinel-value encoding — an accumulated state can never be
  * confused with the identity). Codes: 0 sum, 1 min, 2 max, 3 count,
  * 4 maxsum (slots: set, total, maxPrefix), 5 islands (slots: set, first,
  * last, n; `param` = gap threshold), 6 lag/last (slots: set, value).
  */
private[plans] final class ScanOpRunner(val code: Int, val param: Long)
    extends Serializable {
  val size: Int = code match {
    case 4 => 3
    case 5 => 4
    case _ => 2
  }
  def empty: Array[Long] = new Array[Long](size) // slot 0 = set flag

  /** Fold one row's value into the state (streaming: rows of one run). */
  def addElem(a: Array[Long], v: Long): Unit = {
    if (a(0) == 0L) {
      a(0) = 1L
      code match {
        case 3 => a(1) = 1L
        case 4 => a(1) = v; a(2) = v
        case 5 => a(1) = v; a(2) = v; a(3) = 1L
        case _ => a(1) = v
      }
    } else code match {
      case 0 => a(1) += v
      case 1 => a(1) = math.min(a(1), v)
      case 2 => a(1) = math.max(a(1), v)
      case 3 => a(1) += 1L
      case 4 => a(2) = math.max(a(2), a(1) + v); a(1) += v
      case 5 => if (v - a(2) > param) a(3) += 1L; a(2) = v
      case 6 => a(1) = v
    }
  }

  /** Merge a later run total `b` into `a` (driver-side offset stitch). */
  def merge(a: Array[Long], b: Array[Long]): Unit = {
    if (b(0) != 0L) {
      if (a(0) == 0L) { System.arraycopy(b, 0, a, 0, size) }
      else code match {
        case 0 | 3 => a(1) += b(1)
        case 1 => a(1) = math.min(a(1), b(1))
        case 2 => a(1) = math.max(a(1), b(1))
        case 4 => a(2) = math.max(a(2), a(1) + b(2)); a(1) += b(1)
        case 5 =>
          val merged = if (b(1) - a(2) > param) 0L else 1L
          a(3) = a(3) + b(3) - merged
          a(2) = b(2)
        case 6 => a(1) = b(1)
      }
    }
  }

  /** Emitted value; empty states emit the op's identity (the exclusive
    * form's first-row value): 0 for sum/count/islands, MaxValue for min,
    * MinValue for max/maxsum; lag emits SQL NULL (see [[emitIsNull]]).
    */
  def emit(a: Array[Long]): Long =
    if (a(0) != 0L) code match {
      case 4 => a(2)
      case 5 => a(3)
      case _ => a(1)
    } else code match {
      case 1 => Long.MaxValue
      case 2 | 4 => Long.MinValue
      case _ => 0L
    }
  def emitIsNull(a: Array[Long]): Boolean = code == 6 && a(0) == 0L
}

private[plans] object ScanOpRunner {
  def code(op: String): Int = op match {
    case "sum" => 0
    case "min" => 1
    case "max" => 2
    case "count" => 3
    case "maxsum" => 4
    case "islands" => 5
    case "lag" => 6
    case other => throw new IllegalArgumentException(s"op: $other")
  }
}

case class PrefixScanExec(
    keyExprs: Seq[Expression],
    order: Seq[SortOrder],
    scanAttrs: Seq[Attribute],
    valueExprs: Seq[Expression],
    ops: Seq[String],
    inclusives: Seq[Boolean],
    params: Seq[Long],
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output ++ scanAttrs
  override def producedAttributes: AttributeSet = AttributeSet(scanAttrs)

  private def sortOrder: Seq[SortOrder] =
    keyExprs.map(SortOrder(_, Ascending)) ++ order

  // range-partitioned + sorted by (key, order): every partition works, keys
  // occupy contiguous partition ranges, so run totals are driver-bounded
  override def requiredChildDistribution: Seq[Distribution] =
    OrderedDistribution(sortOrder) :: Nil
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(sortOrder)

  // both passes are order-preserving maps: downstream consumers of the same
  // (key, order) clustering reuse the range shuffle instead of re-shuffling
  override def outputPartitioning = child.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = child.outputOrdering

  /** Fail INSIDE the pass-1 task the moment one range partition exceeds
    * this many distinct keys — before anything is collected, so misuse
    * (a non-driver-bounded key) can't pressure the driver heap. The
    * operator exists for LOW-cardinality keys (an ordinary keyed window
    * already parallelizes high-cardinality keys). Conf-overridable so the
    * guard itself is testable without materializing 2^16 keys.
    */
  private def maxPartitionKeyRuns: Int = conf
    .getConfString("spark.graft.prefixScan.maxPartitionKeyRuns",
      (1 << 16).toString).toInt

  /** Driver backstop for the collected run count (many partitions, each
    * under the per-partition cap, can still sum past what the driver
    * should hold). Conf-overridable for the same reason.
    */
  private def maxDriverKeyRuns: Int = conf
    .getConfString("spark.graft.prefixScan.maxDriverKeyRuns",
      (1 << 20).toString).toInt

  override protected def doExecute(): RDD[InternalRow] = {
    // Bind to ordinals and canonicalize on the driver: Column-derived trees
    // can carry tags referencing non-serializable internal nodes.
    val boundKeys = keyExprs
      .map(BindReferences.bindReference(_, child.output).canonicalized)
    val boundVals = valueExprs
      .map(BindReferences.bindReference(_, child.output).canonicalized)
    val runners = ops.zip(params)
      .map { case (o, p) => new ScanOpRunner(ScanOpRunner.code(o), p) }.toArray
    val incl = inclusives.toArray
    val n = runners.length
    val outTypes = output.map(_.dataType).toArray
    val partCap = maxPartitionKeyRuns
    val childRDD = child.execute()
    val parts = childRDD.getNumPartitions

    // pass 1: per-(partition, key) run totals — a streaming fold over the
    // sorted stream (keys are contiguous, so state is O(1) per run, no map)
    val runs: Array[(Int, UnsafeRow, Array[Array[Long]])] =
      childRDD.mapPartitionsWithIndex { (i, it) =>
        val keyProj = UnsafeProjection.create(boundKeys)
        val valProj = UnsafeProjection.create(boundVals)
        val out = scala.collection.mutable.ArrayBuffer
          .empty[(Int, UnsafeRow, Array[Array[Long]])]
        var curKey: UnsafeRow = null
        var states: Array[Array[Long]] = null
        while (it.hasNext) {
          val row = it.next()
          val k = keyProj(row)
          if (curKey == null || k != curKey) {
            if (curKey != null) out += ((i, curKey, states))
            require(out.length < partCap,
              s"keyed scan found more than $partCap distinct keys in one " +
                "range partition — key cardinality is not driver-bounded; " +
                "use an ordinary keyed window (high-cardinality keys " +
                "parallelize already)")
            curKey = k.copy()
            states = runners.map(_.empty)
          }
          val vals = valProj(row)
          var j = 0
          while (j < n) { runners(j).addElem(states(j), vals.getLong(j)); j += 1 }
        }
        if (curKey != null) out += ((i, curKey, states))
        out.iterator
      }.collect()
    require(runs.length <= parts + maxDriverKeyRuns,
      s"keyed scan collected ${runs.length} (partition, key) runs across " +
        s"$parts partitions — key cardinality is not driver-bounded; use " +
        "an ordinary keyed window (high-cardinality keys parallelize " +
        "already)")

    // driver: per key, exclusive prefix across its (contiguous) partition
    // run; only non-empty offsets are kept (absent = identity)
    val offsets = scala.collection.mutable.HashMap
      .empty[(Int, UnsafeRow), Array[Array[Long]]]
    runs.groupBy(_._2).foreach { case (k, rs) =>
      val acc = runners.map(_.empty)
      var first = true
      rs.sortBy(_._1).foreach { case (pi, _, tot) =>
        if (!first) offsets((pi, k)) = acc.map(_.clone())
        var j = 0
        while (j < n) { runners(j).merge(acc(j), tot(j)); j += 1 }
        first = false
      }
    }
    val bc = session.sparkContext.broadcast(offsets.toMap)

    // pass 2: stream again (same shuffle), seed each run from its offset,
    // emit child row + scan values as one UnsafeRow
    childRDD.mapPartitionsWithIndex { (i, it) =>
      val keyProj = UnsafeProjection.create(boundKeys)
      val valProj = UnsafeProjection.create(boundVals)
      val outProj = UnsafeProjection.create(outTypes)
      val scanRow = new GenericInternalRow(n)
      val joined = new JoinedRow
      var curKey: UnsafeRow = null
      var states: Array[Array[Long]] = null
      it.map { row =>
        val k = keyProj(row)
        if (curKey == null || k != curKey) {
          curKey = k.copy()
          states = bc.value.get((i, curKey))
            .map(_.map(_.clone()))
            .getOrElse(runners.map(_.empty))
        }
        val vals = valProj(row)
        var j = 0
        while (j < n) {
          if (incl(j)) runners(j).addElem(states(j), vals.getLong(j))
          if (runners(j).emitIsNull(states(j))) scanRow.update(j, null)
          else scanRow.setLong(j, runners(j).emit(states(j)))
          if (!incl(j)) runners(j).addElem(states(j), vals.getLong(j))
          j += 1
        }
        outProj(joined(row, scanRow))
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): SparkPlan =
    copy(child = newChild)
}
