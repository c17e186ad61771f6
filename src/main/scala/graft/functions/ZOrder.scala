package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Z-order (Morton) clustering key — the layout half of the reference's
  * Delta `OPTIMIZE` story (`gps-analytics/src/pipeline/tz_offset.scala:
  * 32-70`; Databricks' `OPTIMIZE ... ZORDER BY`): interleave the bits of
  * rank-quantized dimension values so that range-partitioning by the
  * result co-locates rows that are close in EVERY dimension, making
  * per-file min/max bounds tight on all of them at once. A single-key
  * sort gives perfect file pruning on its own key and none on any other;
  * Z-order trades a little of the first for a lot of the rest (measured
  * in q452's zone-map audit; made physical by
  * `TxTable.compact(zorderBy = ...)`).
  *
  * Shape, all distributed:
  *  1. per-column equi-depth quantile boundaries via `approxQuantile`
  *     (one pass, Greenwald-Khanna — no sort, no collect of data);
  *  2. per-row bucket ids by binary search against the broadcast
  *     boundaries ([[BucketBinExpr]], codegen — stays inside
  *     whole-stage codegen in the rewrite pipeline);
  *  3. bit interleave of the bucket ids with plain shift/and/or columns;
  *  4. caller range-partitions + sorts by the result (see
  *     `TxTable.compact`).
  *
  * Equi-depth (quantile) bucketing rather than min/max linear scaling
  * means skewed columns still spread across the full bucket range — the
  * interleave stays balanced under the skew a 100 TB corpus actually
  * has.
  */
object ZOrder {

  /** Bits per dimension. 8 bits = 256 ranks per column resolves file
    * boundaries for any realistic OPTIMIZE target file count (file count
    * per dimension rarely exceeds a few hundred); up to 7 columns fit in
    * a positive long.
    */
  val BitsPerCol = 8

  /** Bucket id of `v` in 0..bounds.length: the number of boundaries at
    * or below `v`, NaN ranked greatest (Spark's double order). Called
    * from generated code — keep signature primitive.
    */
  def bucketOf(v: Double, bounds: Array[Double]): Long = {
    if (v.isNaN) return bounds.length.toLong
    val i = java.util.Arrays.binarySearch(bounds, v)
    (if (i >= 0) i + 1 else -(i + 1)).toLong
  }

  /** The interleaved z-value column for `cols` of `df`. Runs one
    * `approxQuantile` job eagerly (this is a layout-rewrite helper, not
    * a lazy operator). Null dimension values rank lowest (bucket 0).
    */
  def zvalue(df: DataFrame, cols: Seq[String]): Column = {
    require(cols.nonEmpty, "zorder needs at least one column")
    require(cols.size * BitsPerCol <= 56,
      s"zorder supports at most ${56 / BitsPerCol} columns, got ${cols.size}")
    val schema = df.schema
    val normd = cols.map { name =>
      schema(name).dataType match {
        case DateType => unix_date(col(name)).cast("double")
        case TimestampType => unix_micros(col(name)).cast("double")
        case _: NumericType => col(name).cast("double")
        case StringType =>
          // order-preserving ordinal of the first 8 UTF-8 bytes: exact
          // enough for BUCKETING (file-level clustering needs only
          // coarse rank; ties beyond 8 bytes land in one bucket, which
          // is correct — they're adjacent in the true order too). The
          // double rounding below 2^53 keeps monotonicity (non-strict).
          org.apache.spark.sql.GraftSqlBridge.column(Utf8PrefixOrdinal(
            org.apache.spark.sql.GraftSqlBridge.expression(col(name))))
            .cast("double")
        case dt => throw new IllegalArgumentException(
          s"zorder column $name has unsupported type ${dt.simpleString} " +
            "(numeric, date, timestamp, or string required)")
      }
    }
    val tmp = df.select(normd.zipWithIndex.map { case (c, i) => c.as(s"__zc$i") }: _*)
    val nBuckets = 1 << BitsPerCol
    val probs = (1 until nBuckets).map(_.toDouble / nBuckets).toArray
    val bounds = tmp.stat.approxQuantile(
      cols.indices.map(i => s"__zc$i").toArray, probs, 1.0 / (4 * nBuckets))
    interleave(normd.zip(bounds).map { case (c, bs) =>
      val clean = bs.filterNot(_.isNaN).distinct.sorted
      val raw = org.apache.spark.sql.GraftSqlBridge.column(
        BucketBinExpr(org.apache.spark.sql.GraftSqlBridge.expression(c), clean))
      // a low-cardinality column yields few distinct boundaries and so
      // few significant bucket bits — scale every column's ids to the
      // full 0..2^BitsPerCol-1 range so each dimension carries EQUAL
      // weight in the interleave (else the high-cardinality column's
      // high bits dominate the curve and the other dimension never
      // clusters). Monotone: raw in 0..nb maps onto 0..max evenly.
      val nb = math.max(clean.length, 1)
      floor((raw * lit((nBuckets - 1).toLong)).cast("double") / lit(nb.toDouble))
        .cast("long")
    })
  }

  /** Bit-interleave bucket columns (each a long in 0..2^BitsPerCol-1)
    * into one long — plain shift/and/or `Column` algebra, fully inside
    * whole-stage codegen.
    */
  def interleave(buckets: Seq[Column]): Column = {
    val n = buckets.size
    val terms = for {
      i <- 0 until BitsPerCol
      j <- buckets.indices
    } yield shiftleft(shiftright(buckets(j), i).bitwiseAND(lit(1L)), i * n + j)
    terms.reduce(_ bitwiseOR _)
  }
}

/** Order-preserving ordinal of a string's first 8 UTF-8 bytes, packed
  * big-endian into a non-negative long (shifted down by one bit so the
  * later double cast stays exact-monotone over the whole range):
  * a < b in UTF-8 byte order implies ordinal(a) <= ordinal(b), which is
  * all equi-depth bucketing needs.
  */
case class Utf8PrefixOrdinal(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_utf8_prefix_ordinal"

  override protected def nullSafeEval(v: Any): Any =
    Utf8PrefixOrdinal.ordinal(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s =>
      s"graft.functions.Utf8PrefixOrdinal.ordinal($s)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Utf8PrefixOrdinal {
  /** Static so generated code can call it. */
  def ordinal(s: org.apache.spark.unsafe.types.UTF8String): Long = {
    val b = s.getBytes
    var out = 0L
    var i = 0
    while (i < 8) {
      out = (out << 8) | (if (i < b.length) b(i) & 0xffL else 0L)
      i += 1
    }
    out >>> 1 // keep non-negative; >>> preserves unsigned order
  }
}

/** Bucket id by binary search against fixed equi-depth boundaries;
  * null → bucket 0 (nulls cluster low, like a NULLS FIRST sort).
  */
case class BucketBinExpr(child: Expression, bounds: Array[Double])
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_bucket_bin"

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) 0L
    else ZOrder.bucketOf(v.asInstanceOf[Double], bounds)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val ref = ctx.addReferenceObj("bounds", bounds, "double[]")
    ev.copy(
      code = code"""
        ${childGen.code}
        long ${ev.value} = 0L;
        if (!${childGen.isNull}) {
          ${ev.value} = graft.functions.ZOrder.bucketOf(${childGen.value}, $ref);
        }""",
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
