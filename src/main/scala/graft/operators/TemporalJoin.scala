package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal joins Spark lacks as built-ins: as-of (point-in-time) and
  * bounded range joins, built Spark-first.
  *
  * As-of: instead of a per-row subquery or an exploding theta-join, tag and
  * union both sides, then one `last(value, ignoreNulls)` window per key —
  * one shuffle on the key, one sort, linear scan. This is the standard
  * scalable formulation (same cost shape as a sort-merge join).
  *
  * Range: candidate pairs via time-bucket equi-join (each left row probes
  * its bucket and the adjacent one), exact predicate refines — the same
  * two-phase pattern as the spatial join, so the shuffle key is
  * (key, bucket), never a cross product.
  */
object TemporalJoin {

  /** For each left row (key, t), attach the latest right `valueCol` with
    * right.t <= left.t (per key). Right rows at equal t win (sort puts the
    * right tag first); ties among right rows at the same t break by
    * `tieCol` (latest wins) for determinism.
    *
    * @param left  (keyCol, tCol, ...) — returned in full
    * @param right (keyCol, tCol, tieCol, valueCol)
    */
  def asOf(
      left: DataFrame, right: DataFrame,
      keyCol: String, tCol: String, tieCol: String, valueCol: String): DataFrame = {
    val leftCols = left.columns
    val l = left
      .withColumn("__tag", lit(1))
      .withColumn("__val", lit(null).cast(right.schema(valueCol).dataType))
      .withColumn("__tie", lit(null).cast("long"))
      .select(col(keyCol), col(tCol), col("__tag"), col("__val"), col("__tie"),
        struct(leftCols.map(col): _*).as("__row"))
    val r = right
      .select(col(keyCol), col(tCol), lit(0).as("__tag"),
        col(valueCol).cast(right.schema(valueCol).dataType).as("__val"),
        col(tieCol).cast("long").as("__tie"),
        lit(null).cast(l.schema("__row").dataType).as("__row"))
    val w = Window.partitionBy(keyCol)
      .orderBy(col(tCol), col("__tag"), col("__tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.union(r)
      .withColumn("__asof", last("__val", ignoreNulls = true).over(w))
      .where(col("__tag") === 1)
      .select(leftCols.map(c => col(s"__row.$c").as(c)) :+ col("__asof").as("asof_value"): _*)
  }

  /** Same-key pairs with |a.t - b.t| <= window and a.tie < b.tie.
    * Buckets of `windowSec` width; each left row joins its own and the next
    * bucket, exact |dt| filter refines. Candidate fan-out per row is
    * bounded by bucket occupancy, not table size.
    */
  def rangePairs(
      events: DataFrame, keyCol: String, tCol: String, tieCol: String,
      windowSec: Long): DataFrame = {
    val a = events.select(col(keyCol).as("k"), col(tCol).as("ta"), col(tieCol).as("ia"))
      .withColumn("bucket", explode(array(
        floor(col("ta") / windowSec) - 1,
        floor(col("ta") / windowSec),
        floor(col("ta") / windowSec) + 1)))
    val b = events.select(col(keyCol).as("k"), col(tCol).as("tb"), col(tieCol).as("ib"))
      .withColumn("bucket", floor(col("tb") / windowSec))
    // b sits in exactly one bucket and a probes three distinct ones, so a
    // qualifying pair matches exactly once — no dedup needed
    a.join(b, Seq("k", "bucket"))
      .where(abs(col("ta") - col("tb")) <= windowSec && col("ia") < col("ib"))
      .select(col("k"), col("ia"), col("ib"))
  }
}
