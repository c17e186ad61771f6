package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-file Bloom filters — the point-lookup half of data skipping
  * (Delta's Bloom filter index, published design): zone maps prune
  * RANGE predicates on clustered columns, but an equality probe on a
  * high-cardinality column in arrival-order layout (find one document
  * id in a 100 TB table) hits every file's [min, max]. A per-file Bloom
  * answers "is this key definitely absent from this file?" from
  * O(files × m) driver-side metadata — no false negatives, so pruning
  * on a negative answer is SOUND by construction; false positives only
  * cost an extra file read.
  *
  * Hashing is MD5-based Kirsch-Mitzenmacher (two 64-bit halves h1, h2;
  * position_i = (h1 + i·h2) mod m) over a CANONICAL key string (the
  * long value's decimal form for integral/date/timestamp columns, the
  * raw string otherwise). Insertion ([[BloomAgg]], a mergeable
  * `TypedImperativeAggregate` grouped by file) and the driver-side
  * probe ([[FileBloom.Bloom.mightContain]]) share [[FileBloom.set]]'s
  * exact position function, so parity is by construction, not by
  * convention. FPR ≈ (1 − e^{−kn/m})^k — the defaults (m = 2^20 bits,
  * k = 7) give <1% at ~100k keys/file.
  */
object FileBloom {

  val DefaultBits: Int = 1 << 20
  val DefaultK: Int = 7

  /** The k bit positions of `key` in an m = words.length*64 filter. */
  private def eachPosition(key: String, numWords: Int, k: Int)(f: Int => Unit): Unit = {
    val d = MessageDigest.getInstance("MD5")
      .digest(key.getBytes(StandardCharsets.UTF_8))
    var h1 = 0L; var h2 = 0L
    var i = 0
    while (i < 8) {
      h1 = (h1 << 8) | (d(i) & 0xffL)
      h2 = (h2 << 8) | (d(i + 8) & 0xffL)
      i += 1
    }
    val m = numWords.toLong * 64L
    var j = 0
    while (j < k) {
      val pos = (((h1 + j * h2) % m) + m) % m
      f(pos.toInt)
      j += 1
    }
  }

  def set(words: Array[Long], key: String, k: Int): Unit =
    eachPosition(key, words.length, k)(p => words(p >> 6) |= (1L << (p & 63)))

  def contains(words: Array[Long], key: String, k: Int): Boolean = {
    var all = true
    eachPosition(key, words.length, k) { p =>
      if ((words(p >> 6) & (1L << (p & 63))) == 0L) all = false
    }
    all
  }

  /** A file's filter for one column, as stored in the stats sidecar. */
  case class Bloom(k: Int, words: Array[Long]) {
    def mightContain(key: String): Boolean = contains(words, key, k)
    def toBase64: String = {
      val bb = java.nio.ByteBuffer.allocate(words.length * 8)
      words.foreach(bb.putLong)
      java.util.Base64.getEncoder.encodeToString(bb.array())
    }
  }

  def fromBase64(k: Int, s: String): Bloom = {
    val bytes = java.util.Base64.getDecoder.decode(s)
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val words = new Array[Long](bytes.length / 8)
    var i = 0
    while (i < words.length) { words(i) = bb.getLong(); i += 1 }
    Bloom(k, words)
  }
}

/** `graft_file_bloom(key)` — mergeable Bloom-filter aggregate over a
  * long or string key column; eval returns the filter's words as
  * binary. Partials merge by OR, so the plan is the standard
  * partial → exchange → final aggregate shape.
  */
case class BloomAgg(
    child: Expression,
    numWords: Int,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(numWords > 0 && k > 0)

  override def prettyName: String = "graft_file_bloom"
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_file_bloom expects a long or string key, got $other")
  }

  override def createAggregationBuffer(): Array[Long] = new Array[Long](numWords)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val key = child.dataType match {
        case LongType => v.asInstanceOf[Long].toString
        case _ => v.asInstanceOf[UTF8String].toString
      }
      FileBloom.set(buf, key, k)
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) |= other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = {
    val bb = java.nio.ByteBuffer.allocate(buf.length * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.length)
    buf.foreach(out.writeLong)
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new Array[Long](n)
    var i = 0
    while (i < n) { buf(i) = in.readLong(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))
}
