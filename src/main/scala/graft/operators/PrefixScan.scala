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
}
