package graft.operators

import org.apache.spark.sql.{Column, DataFrame, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{Ascending, AttributeReference, Expression, Literal, SortOrder}
import org.apache.spark.sql.catalyst.expressions.objects.AssertNotNull
import org.apache.spark.sql.types.LongType

import graft.plans.{PrefixScanNode, PrefixScanStrategy}

/** Distributed prefix scan (running aggregate over a GLOBAL order).
  *
  * `sum(x) OVER (ORDER BY ...)` with no PARTITION BY funnels the whole
  * table through one partition — the same scale killer as global
  * row_number, and the reason every engine ships a two-phase scan
  * instead: (1) range-sort (parallel), compute each partition's local
  * running aggregate plus its total; (2) collect the #partitions totals
  * (tiny), exclusive-prefix-combine them on the driver, and broadcast
  * each partition its offset. Results are identical to the window form
  * for a total ordering (callers must include a tie-break column).
  *
  * This is the DataFrame API over the physical operator in
  * `graft.plans.PrefixScanPlan` (`PrefixScanNode`/`PrefixScanExec`,
  * registered by `GraftExtensions`): UnsafeRow in/out, plan-visible, and
  * the node declares its output ordering/partitioning so downstream ops
  * on the same keys reuse the range shuffle.
  */
object PrefixScan {

  /** Append `outCol` = running aggregate of `valueCol` (Long) in the
    * total order of `sortCols`. `op` is "sum" or "min". `inclusive`
    * false gives the EXCLUSIVE scan (aggregate of strictly-preceding
    * rows; the first row gets the op's identity — MaxValue for min,
    * 0 for sum), the form dominance tests need.
    */
  def scanLong(df: DataFrame, outCol: String, valueCol: String, op: String,
      inclusive: Boolean, sortCols: Column*): DataFrame = {
    require(Set("sum", "min")(op), s"op: $op")
    build(df, Nil, Seq(KeyedScanCol(outCol, valueCol, op, inclusive)), sortCols)
  }

  /** One running aggregate to compute in a keyed scan. `op` is one of
    *  - "sum" / "min" / "max" / "count" — scalar monoids (count ignores
    *    `valueCol`, pass "");
    *  - "maxsum" — the running MAX of the running prefix SUM (the
    *    peak-so-far of a cumulative path, e.g. for drawdowns): the PAIR
    *    monoid (total, maxPrefix) with combine = (a.t + b.t,
    *    max(a.m, a.t + b.m));
    *  - "islands" — the running gaps-and-islands id: `valueCol` is the
    *    (sorted) position and `param` the gap threshold; a new island
    *    starts where pos − prevPos > param. The SEGMENT monoid
    *    (first, last, islandCount) with combine = (a.first, b.last,
    *    a.n + b.n − (b.first − a.last > param ? 0 : 1)) — the emitted
    *    running count IS the row's 1-based island id.
    * Composite monoids stitch across partitions exactly like the scalar
    * ops, so one sort serves the whole statistic. `inclusive` false =
    * aggregate of strictly-preceding same-key rows (identity on each
    * key's first row: 0 for sum/count/islands, MaxValue for min,
    * MinValue for max/maxsum).
    */
  final case class KeyedScanCol(outCol: String, valueCol: String, op: String,
      inclusive: Boolean = true, param: Long = 0L)

  /** Keyed distributed prefix scan: running aggregates of `cols` PER KEY
    * in the total order of (keyCols, sortCols) — the scalable form of
    * `agg OVER (PARTITION BY lowCardKey ORDER BY ...)`.
    *
    * `Window.partitionBy(lowCardKey)` over a data-sized frame runs with
    * parallelism = #distinct keys (3–10 tasks each sorting their whole
    * key's slice at 100 TB). This operator instead range-sorts by
    * (key, order) — every partition works, keys just occupy contiguous
    * partition RANGES — then stitches each key's per-partition folds
    * with a broadcast (partition, key) → offset frame, exactly like the
    * unkeyed scan above. Results are identical to the window form for a
    * total per-key ordering (callers must include a tie-break column).
    *
    * Bounded-collect contract: the sort makes each key a contiguous run
    * of partitions, so pass 1 collects ≤ #partitions + #distinctKeys
    * rows. The operator is FOR low-cardinality keys (the case where the
    * plain keyed window loses parallelism); high-cardinality keys
    * should stay on the ordinary window, which already parallelizes.
    * Misuse fails fast INSIDE the pass-1 task (per-partition distinct-key
    * cap) before anything reaches the driver, with a driver-side run
    * count backstop behind it. `valueCol`s must be non-null Long.
    */
  def scanLongKeyed(df: DataFrame, keyCols: Seq[String],
      cols: Seq[KeyedScanCol], sortCols: Column*): DataFrame = {
    require(cols.nonEmpty, "at least one KeyedScanCol")
    cols.foreach(c =>
      require(Set("sum", "min", "max", "count", "maxsum", "islands")(c.op),
        s"op: ${c.op}"))
    build(df, keyCols, cols, sortCols)
  }

  /** Keyed distributed lag: previous same-key row's `valueCol` (Long,
    * non-null) in the total order of (keyCols, sortCols); null on each
    * key's first row — the scalable form of
    * `lag(v) OVER (PARTITION BY lowCardKey ORDER BY ...)`.
    *
    * Same machinery as [[scanLongKeyed]]: lag IS the exclusive scan of
    * the "last value" monoid (combine keeps the later operand), so the
    * per-partition fold and the driver's exclusive-prefix stitch hand
    * every (partition, key) the last value of the nearest preceding
    * partition holding that key. Same bounded-collect contract.
    */
  def lagLongKeyed(df: DataFrame, outCol: String, valueCol: String,
      keyCols: Seq[String], sortCols: Column*): DataFrame =
    build(df, keyCols,
      Seq(KeyedScanCol(outCol, valueCol, "lag", inclusive = false)), sortCols)

  private def build(df: DataFrame, keyCols: Seq[String],
      cols: Seq[KeyedScanCol], sortCols: Seq[Column]): DataFrame = {
    val spark = df.sparkSession
    // Sessions built without GraftExtensions would otherwise fail planning
    // with an opaque "No plan for PrefixScanNode" — register the strategy
    // on demand so the operator works on vanilla sessions too (the same
    // property the rest of the operator surface keeps).
    if (!spark.sessionState.planner.strategies
        .exists(_.isInstanceOf[PrefixScanStrategy]))
      spark.experimental.extraStrategies =
        new PrefixScanStrategy +: spark.experimental.extraStrategies
    // The exec streams the child twice (the range shuffle is reused across
    // the two passes, but a lost shuffle file replays the child lineage):
    // a nondeterministic child could hand pass 2 different rows than the
    // ones pass 1 folded offsets from — fail fast instead.
    val analyzedChild = GraftSqlBridge.analyzed(df)
    require(!analyzedChild.exists(_.expressions.exists(_.exists(!_.deterministic))),
      "prefix scan over a nondeterministic child: the two-pass scan " +
        "requires replayable input — materialize the frame first " +
        "(e.g. df.localCheckpoint())")
    val keyExprs: Seq[Expression] =
      keyCols.map(c => GraftSqlBridge.expression(df.col(c)))
    val order: Seq[SortOrder] = sortCols.map { c =>
      GraftSqlBridge.expression(c) match {
        case so: SortOrder => so
        case e => SortOrder(e, Ascending)
      }
    }
    val scanAttrs = cols.map(c =>
      AttributeReference(c.outCol, LongType, nullable = c.op == "lag")())
    val valueExprs: Seq[Expression] = cols.map { c =>
      if (c.op == "count") Literal(0L)
      else {
        val e = GraftSqlBridge.expression(df.col(c.valueCol))
        require(e.dataType == LongType,
          s"${c.valueCol} must be LongType, got ${e.dataType}")
        // the exec reads values with UnsafeRow.getLong, which renders a
        // null as 0 — silently wrong for min/max/sum. Enforce the
        // non-null contract in the projection itself: a null value fails
        // the task with the column named instead of corrupting the scan.
        if (e.nullable)
          AssertNotNull(e, Seq(s"prefix-scan value column ${c.valueCol} " +
            "(contract: non-null Long)"))
        else e
      }
    }
    GraftSqlBridge.ofRows(spark, PrefixScanNode(keyExprs, order, scanAttrs,
      valueExprs, cols.map(_.op), cols.map(_.inclusive), cols.map(_.param),
      analyzedChild))
  }
}
