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

/** Mutable state of `QuantileSketchAgg`: MRL compactor buffers — level l
  * holds items of weight 2^l; `parity(l)` alternates which half survives
  * each compaction (the classic bias halver; still fully deterministic
  * for a given update/merge order).
  */
final class QuantileSketchState {
  var n: Long = 0L
  val levels: mutable.ArrayBuffer[mutable.ArrayBuffer[Long]] =
    mutable.ArrayBuffer(mutable.ArrayBuffer.empty[Long])
  val parity: mutable.ArrayBuffer[Int] = mutable.ArrayBuffer(0)
}

/** The MRL compactor core, shared by the batch TypedImperativeAggregate
  * (QuantileSketchAgg) and the streaming twin
  * (streaming/StreamingQuantiles) so their guarantee analysis is one
  * piece of code.
  */
object MrlOps {

  def ensureLevel(st: QuantileSketchState, l: Int): Unit =
    while (st.levels.size <= l) {
      st.levels += mutable.ArrayBuffer.empty[Long]
      st.parity += 0
    }

  /** Sort level l, promote an alternating half of its even prefix to
    * l+1 (an odd leftover stays at level l — total weight is preserved
    * exactly), cascade upward while any buffer is full.
    */
  def compact(st: QuantileSketchState, l0: Int, k: Int): Unit = {
    var l = l0
    while (l < st.levels.size && st.levels(l).size >= k) {
      ensureLevel(st, l + 1)
      val buf = st.levels(l)
      val arr = buf.toArray
      java.util.Arrays.sort(arr)
      val even = arr.length - (arr.length % 2)
      val off = st.parity(l)
      st.parity(l) = 1 - off
      val up = st.levels(l + 1)
      var i = off
      while (i < even) { up += arr(i); i += 2 }
      buf.clear()
      if (even < arr.length) buf += arr(arr.length - 1) // odd leftover
      l += 1
    }
  }

  def insert(st: QuantileSketchState, v: Long, k: Int): Unit = {
    st.n += 1L
    st.levels(0) += v
    if (st.levels(0).size >= k) compact(st, 0, k)
  }

  def mergeInto(st: QuantileSketchState, other: QuantileSketchState, k: Int): Unit = {
    st.n += other.n
    var l = 0
    while (l < other.levels.size) {
      ensureLevel(st, l)
      st.levels(l) ++= other.levels(l)
      l += 1
    }
    l = 0
    while (l < st.levels.size) { compact(st, l, k); l += 1 }
  }

  /** The 9 decile estimates: smallest item whose cumulative weight
    * reaches max(1, (d·n) div 10), d = 1..9.
    */
  def deciles(st: QuantileSketchState): Array[Long] = {
    val items = mutable.ArrayBuffer.empty[(Long, Long)]
    var l = 0
    while (l < st.levels.size) {
      val w = 1L << l
      st.levels(l).foreach(v => items += ((v, w)))
      l += 1
    }
    val sorted = items.sortBy(_._1).toArray
    val ests = new Array[Long](9)
    var d = 1
    while (d <= 9) {
      val target = math.max(1L, (d * st.n) / 10L)
      var cum = 0L
      var i = 0
      var est = if (sorted.nonEmpty) sorted(sorted.length - 1)._1 else 0L
      var found = false
      while (i < sorted.length && !found) {
        cum += sorted(i)._2
        if (cum >= target) { est = sorted(i)._1; found = true }
        i += 1
      }
      ests(d - 1) = est
      d += 1
    }
    ests
  }
}

/** `graft_quantile_sketch(x, k)` — deterministic mergeable quantile
  * sketch (the Manku–Rajagopalan–Lindsay compactor scheme KLL
  * derandomizes): level-l buffers hold items of weight 2^l; a full
  * buffer sorts and promotes an alternating half to level l+1. Partials
  * merge by buffer concatenation + re-compaction, so the plan keeps the
  * standard partial → tiny exchange → final aggregate shape — this is
  * how a 100 TB percentile runs without q14's full sort or an exact
  * per-value groupBy.
  *
  * Deterministic error bound (holds for ANY merge tree — each level-l
  * compaction perturbs any rank by ≤ 2^l, and level l sees at most
  * ~2n/(k·2^l) compactions): every reported decile's TRUE rank is
  * within 2·L·n/(k−1) + k of its target, L = ⌈log2(2n/k)⌉ + 2. Like
  * the Misra-Gries estimates (HeavyHittersAgg), the VALUES depend on
  * Spark's nondeterministic merge order, so oracle-checked queries
  * assert the guarantee band (computed against EXACT ranks), never the
  * raw estimates.
  *
  * eval() returns array<long>: the 9 decile estimates (smallest item
  * whose cumulative weight reaches max(1, (d·n) div 10), d = 1..9).
  */
case class QuantileSketchAgg(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[QuantileSketchState] {

  require(k >= 8, s"graft_quantile_sketch: capacity must be >= 8, got $k")

  override def prettyName: String = "graft_quantile_sketch"
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_quantile_sketch expects a bigint column, got $other")
  }

  override def createAggregationBuffer(): QuantileSketchState =
    new QuantileSketchState

  override def update(st: QuantileSketchState, input: InternalRow): QuantileSketchState = {
    val v = child.eval(input)
    if (v != null) MrlOps.insert(st, v.asInstanceOf[Long], k)
    st
  }

  override def merge(st: QuantileSketchState, other: QuantileSketchState): QuantileSketchState = {
    MrlOps.mergeInto(st, other, k)
    st
  }

  override def eval(st: QuantileSketchState): Any =
    new GenericArrayData(MrlOps.deciles(st).map(_.asInstanceOf[Any]))

  override def serialize(st: QuantileSketchState): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeLong(st.n)
    out.writeInt(st.levels.size)
    var l = 0
    while (l < st.levels.size) {
      out.writeInt(st.parity(l))
      val buf = st.levels(l)
      out.writeInt(buf.size)
      buf.foreach(out.writeLong)
      l += 1
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): QuantileSketchState = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val st = new QuantileSketchState
    st.n = in.readLong()
    val nl = in.readInt()
    st.levels.clear(); st.parity.clear()
    var l = 0
    while (l < nl) {
      st.parity += in.readInt()
      val sz = in.readInt()
      val buf = mutable.ArrayBuffer.empty[Long]
      var i = 0
      while (i < sz) { buf += in.readLong(); i += 1 }
      st.levels += buf
      l += 1
    }
    if (st.levels.isEmpty) { st.levels += mutable.ArrayBuffer.empty[Long]; st.parity += 0 }
    st
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): QuantileSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): QuantileSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}
