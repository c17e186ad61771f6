package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `graft_heavy_hitters(term, k)` — Misra-Gries frequent-items sketch as a
  * custom `TypedImperativeAggregate`: the mergeable-summary answer to "top
  * words over 100 TB" when an exact `groupBy(term)` would shuffle a
  * domain-sized table. State is at most `k` (term, count) pairs per
  * partial aggregate; partials merge associatively, so the plan is the
  * same partial -> exchange-of-k-rows -> final shape as any aggregate.
  *
  * Guarantees (Misra-Gries, and they survive arbitrary merge trees —
  * Agarwal et al., "Mergeable Summaries", PODS'12): with capacity k over
  * n total updates, every stored estimate satisfies
  * `true - n/(k+1) <= est <= true`, and any item with true frequency
  * > n/(k+1) is guaranteed present in the sketch. The per-item ESTIMATES
  * depend on merge order (Spark's partial-aggregation order is
  * nondeterministic), so oracle-checked queries must assert the
  * guarantees (membership + error band), not the raw estimates — the
  * q99 error-band pattern.
  *
  * eval() returns array<struct<term, est>> sorted by (est desc, term asc)
  * for a deterministic ARRANGEMENT of whatever the merge order produced.
  */
case class HeavyHittersAgg(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[UTF8String, Long]] {

  require(k > 0, s"graft_heavy_hitters: capacity must be positive, got $k")

  override def prettyName: String = "graft_heavy_hitters"
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("term", StringType, nullable = false),
    StructField("est", LongType, nullable = false))), containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_heavy_hitters expects a string column, got $other")
  }

  override def createAggregationBuffer(): mutable.HashMap[UTF8String, Long] =
    mutable.HashMap.empty

  override def update(
      buf: mutable.HashMap[UTF8String, Long],
      input: InternalRow): mutable.HashMap[UTF8String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String]
      buf.get(s) match {
        case Some(c) => buf.update(s, c + 1L)
        case None if buf.size < k =>
          // clone: the UTF8String may point into a reused row buffer
          buf.update(s.clone(), 1L)
        case None =>
          // decrement-all: the classic MG step — every stored count and
          // the unseen item each "pay" one, preserving est >= true - n/(k+1)
          val dead = mutable.ArrayBuffer.empty[UTF8String]
          buf.keysIterator.foreach { t =>
            val c = buf(t) - 1L
            if (c <= 0L) dead += t else buf.update(t, c)
          }
          dead.foreach(buf.remove)
      }
    }
    buf
  }

  override def merge(
      buf: mutable.HashMap[UTF8String, Long],
      other: mutable.HashMap[UTF8String, Long]): mutable.HashMap[UTF8String, Long] = {
    other.foreach { case (t, c) =>
      buf.update(t, buf.getOrElse(t, 0L) + c)
    }
    if (buf.size > k) {
      // subtract the (k+1)-th largest count from everything, drop <= 0:
      // the mergeable-summaries reduction back to capacity k
      val counts = buf.values.toArray
      java.util.Arrays.sort(counts)
      val d = counts(counts.length - (k + 1)) // (k+1)-th largest
      val dead = mutable.ArrayBuffer.empty[UTF8String]
      buf.keysIterator.foreach { t =>
        val c = buf(t) - d
        if (c <= 0L) dead += t else buf.update(t, c)
      }
      dead.foreach(buf.remove)
    }
    buf
  }

  override def eval(buf: mutable.HashMap[UTF8String, Long]): Any = {
    val sorted = buf.toArray.sortBy { case (t, c) => (-c, t) }
    new GenericArrayData(sorted.map { case (t, c) =>
      InternalRow(t, c)
    }.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: mutable.HashMap[UTF8String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (t, c) =>
      val bytes = t.getBytes
      out.writeInt(bytes.length)
      out.write(bytes)
      out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[UTF8String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[UTF8String, Long]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf.update(UTF8String.fromBytes(b), in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HeavyHittersAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HeavyHittersAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}
