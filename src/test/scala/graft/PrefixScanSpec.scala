package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.PrefixScan

/** PrefixScan ≡ the single-partition window form, proven on data forced
  * across multiple partitions (the whole point of the operator is that
  * partition boundaries stitch correctly via the offset pass).
  */
class PrefixScanSpec extends SparkSpec {
  import spark.implicits._

  private def data = Seq(
    (5L, 10L), (1L, 40L), (3L, 20L), (2L, 35L), (4L, 15L),
    (7L, 5L), (6L, 50L), (9L, 1L), (8L, 30L), (10L, 25L))
    .toDF("k", "v")
    .repartition(4) // force partition-boundary stitching

  test("inclusive sum scan equals the window running total") {
    val got = PrefixScan.scanLong(data, "cum", "v", "sum",
        inclusive = true, asc("k"))
      .select("k", "cum").as[(Long, Long)].collect().sortBy(_._1)
    val w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, 0)
    val want = data.withColumn("cum", sum("v").over(w))
      .select("k", "cum").as[(Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq == want.toSeq)
  }

  test("exclusive min scan equals the window min over strictly-preceding " +
      "rows (identity MaxValue on the first row)") {
    val got = PrefixScan.scanLong(data, "m", "v", "min",
        inclusive = false, asc("k"))
      .select("k", "m").as[(Long, Long)].collect().sortBy(_._1)
    val w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, -1)
    val want = data.withColumn("m", coalesce(min("v").over(w),
        lit(Long.MaxValue)))
      .select("k", "m").as[(Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq == want.toSeq)
  }

  test("empty input yields empty output") {
    val empty = data.where(lit(false))
    assert(PrefixScan.scanLong(empty, "cum", "v", "sum",
      inclusive = true, asc("k")).count() == 0L)
  }
}
