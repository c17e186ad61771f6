package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.{LongType, StructField, StructType}

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
  * Like `Ranking.globalRank` this is a deliberate RDD touch: the
  * per-partition fold is imperative and has no Catalyst counterpart.
  * The two jobs share the sort's shuffle output, so the data is ranged
  * once. Long-typed `sum` and `min` cover the engine's scan users
  * (integer-exact by convention); both are associative monoids.
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
    val (zero, combine): (Long, (Long, Long) => Long) = op match {
      case "sum" => (0L, _ + _)
      case "min" => (Long.MaxValue, math.min)
      case other => throw new IllegalArgumentException(s"op: $other")
    }
    val sorted = df.sort(sortCols: _*)
    val idx = sorted.schema.fieldIndex(valueCol)
    val rdd = sorted.rdd
    // pass 1: per-partition totals (runs the sort's shuffle; pass 2
    // reuses the same shuffle files, so the data is ranged only once)
    val totals = rdd.mapPartitionsWithIndex { (i, it) =>
      var acc = zero
      it.foreach(r => acc = combine(acc, r.getLong(idx)))
      Iterator((i, acc))
    }.collect().sortBy(_._1).map(_._2)
    val offsets = totals.scanLeft(zero)(combine) // exclusive prefix
    val bc = df.sparkSession.sparkContext.broadcast(offsets)
    val schema = StructType(sorted.schema.fields :+
      StructField(outCol, LongType, nullable = false))
    val out = rdd.mapPartitionsWithIndex { (i, it) =>
      var acc = bc.value(i)
      it.map { r =>
        val before = acc
        acc = combine(acc, r.getLong(idx))
        Row.fromSeq(r.toSeq :+ (if (inclusive) acc else before))
      }
    }
    df.sparkSession.createDataFrame(out, schema)
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

  /** Bounded-collect safety net for the keyed operators: the sort makes
    * the pass-1 collect ≤ #partitions + #distinctKeys rows, so crossing
    * this cap means the key is NOT driver-bounded — fail with a
    * diagnostic instead of silently pressuring the driver heap. (An
    * ordinary keyed window already parallelizes for high-cardinality
    * keys; these operators exist for the low-cardinality case.)
    */
  private val MaxDriverKeyRuns: Int = 1 << 20
  private def guardKeyRuns(runs: Int, parts: Int): Unit =
    require(runs <= parts + MaxDriverKeyRuns,
      s"keyed scan collected $runs (partition, key) runs across $parts " +
        "partitions — key cardinality is not driver-bounded; use an " +
        "ordinary keyed window (high-cardinality keys parallelize already)")

  /** Per-op scan monoid: state vector zero, per-row element, associative
    * combine (in-place into `a`; the zero state is a two-sided identity),
    * and the emitted Long.
    */
  private final class ScanOp(val op: String, val param: Long)
      extends Serializable {
    val size: Int = op match {
      case "maxsum" => 2
      case "islands" => 3
      case _ => 1
    }
    def zero: Array[Long] = op match {
      case "min" => Array(Long.MaxValue)
      case "max" => Array(Long.MinValue)
      case "maxsum" => Array(0L, Long.MinValue)
      case "islands" => Array(Long.MinValue, Long.MinValue, 0L)
      case _ => Array(0L)
    }
    private def isZero(b: Array[Long]): Boolean = op match {
      case "maxsum" => b(0) == 0L && b(1) == Long.MinValue
      case "islands" => b(2) == 0L
      case _ => false
    }
    def elem(v: Long): Array[Long] = op match {
      case "count" => Array(1L)
      case "maxsum" => Array(v, v)
      case "islands" => Array(v, v, 1L)
      case _ => Array(v)
    }
    def combine(a: Array[Long], b: Array[Long]): Unit = op match {
      case "min" => a(0) = math.min(a(0), b(0))
      case "max" => a(0) = math.max(a(0), b(0))
      case "maxsum" =>
        if (!isZero(b)) {
          if (isZero(a)) { a(0) = b(0); a(1) = b(1) }
          else { a(1) = math.max(a(1), a(0) + b(1)); a(0) = a(0) + b(0) }
        }
      case "islands" =>
        if (!isZero(b)) {
          if (isZero(a)) { a(0) = b(0); a(1) = b(1); a(2) = b(2) }
          else {
            val merged = if (b(0) - a(1) > param) 0L else 1L
            a(2) = a(2) + b(2) - merged
            a(1) = b(1)
          }
        }
      case _ => a(0) = a(0) + b(0)
    }
    def emit(a: Array[Long]): Long = op match {
      case "maxsum" => a(1)
      case "islands" => a(2)
      case _ => a(0)
    }
  }

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
    * `valueCol`s must be non-null Long.
    */
  def scanLongKeyed(df: DataFrame, keyCols: Seq[String],
      cols: Seq[KeyedScanCol], sortCols: Column*): DataFrame = {
    require(cols.nonEmpty, "at least one KeyedScanCol")
    cols.foreach(c =>
      require(Set("sum", "min", "max", "count", "maxsum", "islands")(c.op),
        s"op: ${c.op}"))
    val sorted = df.sort(keyCols.map(df.col) ++ sortCols: _*)
    val schema0 = sorted.schema
    val keyIdx = keyCols.map(schema0.fieldIndex).toArray
    val valIdx = cols.map(c =>
      if (c.op == "count") -1 else schema0.fieldIndex(c.valueCol)).toArray
    val ops = cols.map(c => new ScanOp(c.op, c.param)).toArray
    val incl = cols.map(_.inclusive).toArray
    val n = ops.length
    def zeros: Array[Array[Long]] = ops.map(_.zero)
    def rowKey(r: Row): List[Any] = keyIdx.map(r.get).toList
    def contrib(j: Int, r: Row): Array[Long] =
      ops(j).elem(if (valIdx(j) < 0) 0L else r.getLong(valIdx(j)))
    val rdd = sorted.rdd
    // pass 1: per-(partition, key) totals, reusing the sort's shuffle
    val totals = rdd.mapPartitionsWithIndex { (i, it) =>
      val m = scala.collection.mutable.LinkedHashMap
        .empty[List[Any], Array[Array[Long]]]
      it.foreach { r =>
        val acc = m.getOrElseUpdate(rowKey(r), zeros)
        var j = 0
        while (j < n) { ops(j).combine(acc(j), contrib(j, r)); j += 1 }
      }
      m.iterator.map { case (k, a) => (i, k, a) }
    }.collect()
    guardKeyRuns(totals.length, rdd.getNumPartitions)
    // driver: per key, exclusive prefix across its partition run
    val offsets: Map[(Int, List[Any]), Array[Array[Long]]] =
      totals.groupBy(_._2).iterator.flatMap { case (k, rows) =>
        val acc = zeros
        rows.sortBy(_._1).map { case (pi, _, tot) =>
          val off = acc.map(_.clone())
          var j = 0
          while (j < n) { ops(j).combine(acc(j), tot(j)); j += 1 }
          ((pi, k), off)
        }
      }.toMap
    val bc = df.sparkSession.sparkContext.broadcast(offsets)
    val schema = StructType(schema0.fields ++
      cols.map(c => StructField(c.outCol, LongType, nullable = false)))
    val out = rdd.mapPartitionsWithIndex { (i, it) =>
      val live = scala.collection.mutable.HashMap
        .empty[List[Any], Array[Array[Long]]]
      it.map { r =>
        val k = rowKey(r)
        val acc = live.getOrElseUpdate(k,
          bc.value.get((i, k)).map(_.map(_.clone())).getOrElse(zeros))
        val outs = new Array[Any](n)
        var j = 0
        while (j < n) {
          val before = ops(j).emit(acc(j))
          ops(j).combine(acc(j), contrib(j, r))
          outs(j) = if (incl(j)) ops(j).emit(acc(j)) else before
          j += 1
        }
        Row.fromSeq(r.toSeq ++ outs)
      }
    }
    df.sparkSession.createDataFrame(out, schema)
  }

  /** Keyed distributed lag: previous same-key row's `valueCol` (Long,
    * non-null) in the total order of (keyCols, sortCols); null on each
    * key's first row — the scalable form of
    * `lag(v) OVER (PARTITION BY lowCardKey ORDER BY ...)`.
    *
    * Same machinery as [[scanLongKeyed]], but the stitched state is a
    * BOUNDARY CARRY instead of a monoid offset: pass 1 records each
    * (partition, key)'s LAST value; the driver hands every
    * (partition, key) the last value of the nearest preceding partition
    * holding that key. Same bounded-collect contract (low-card keys).
    */
  def lagLongKeyed(df: DataFrame, outCol: String, valueCol: String,
      keyCols: Seq[String], sortCols: Column*): DataFrame = {
    val sorted = df.sort(keyCols.map(df.col) ++ sortCols: _*)
    val schema0 = sorted.schema
    val keyIdx = keyCols.map(schema0.fieldIndex).toArray
    val vi = schema0.fieldIndex(valueCol)
    def rowKey(r: Row): List[Any] = keyIdx.map(r.get).toList
    val rdd = sorted.rdd
    val lasts = rdd.mapPartitionsWithIndex { (i, it) =>
      val m = scala.collection.mutable.LinkedHashMap.empty[List[Any], Long]
      it.foreach(r => m(rowKey(r)) = r.getLong(vi))
      m.iterator.map { case (k, v) => (i, k, v) }
    }.collect()
    guardKeyRuns(lasts.length, rdd.getNumPartitions)
    val boundary: Map[(Int, List[Any]), Long] =
      lasts.groupBy(_._2).iterator.flatMap { case (k, rows) =>
        val ordered = rows.sortBy(_._1)
        ordered.iterator.zip(ordered.iterator.drop(1)).map {
          case ((_, _, prevLast), (pi, _, _)) => ((pi, k), prevLast)
        }
      }.toMap
    val bc = df.sparkSession.sparkContext.broadcast(boundary)
    val schema = StructType(schema0.fields :+
      StructField(outCol, LongType, nullable = true))
    val out = rdd.mapPartitionsWithIndex { (i, it) =>
      val prev = scala.collection.mutable.HashMap.empty[List[Any], Any]
      it.map { r =>
        val k = rowKey(r)
        val p = prev.getOrElse(k,
          bc.value.get((i, k)).map(Long.box).orNull)
        prev(k) = Long.box(r.getLong(vi))
        Row.fromSeq(r.toSeq :+ p)
      }
    }
    df.sparkSession.createDataFrame(out, schema)
  }
}
