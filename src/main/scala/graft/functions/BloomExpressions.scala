package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.BloomFilter

/** `graft_bloom_contains(key)` — membership probe against a pre-built
  * Bloom filter, for semi-join reduction: at 100 TB the dominant cost of
  * `big JOIN small` is shuffling `big`, most of whose rows will not match;
  * probing a broadcast-sized Bloom of `small`'s keys BEFORE the shuffle
  * drops non-matching rows at the scan (the classic runtime-filter /
  * sideways-information-passing move — Spark's own
  * `spark.sql.optimizer.runtime.bloomFilter.enabled` does this between
  * stages of one query; this expression makes it available as a library
  * op against any externally built filter, e.g. one persisted from a
  * previous job). False positives pass the probe and are eliminated by
  * the exact join that follows, so composed results stay EXACTLY equal to
  * the plain join — no error band in the contract.
  *
  * The filter travels as its serialized bytes (java-serializable, compact)
  * and is deserialized once per task into generated-class state, so the
  * per-row cost is just the hash probes and the expression stays inside
  * whole-stage codegen.
  */
case class BloomMightContain(child: Expression, bloomBytes: Array[Byte])
    extends UnaryExpression with Predicate {

  override def prettyName: String = "graft_bloom_contains"
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_bloom_contains expects an integral key, got $other")
  }

  @transient private lazy val bloom: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bloomBytes))

  override protected def nullSafeEval(v: Any): Any = child.dataType match {
    case LongType => bloom.mightContainLong(v.asInstanceOf[Long])
    case _ => bloom.mightContainLong(v.asInstanceOf[Int].toLong)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bytesRef = ctx.addReferenceObj("bloomBytes", bloomBytes, "byte[]")
    val bloomCls = classOf[BloomFilter].getName
    val bloomVar = ctx.addMutableState(bloomCls, "graftBloom")
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |if ($bloomVar == null) {
         |  try {
         |    $bloomVar = $bloomCls.readFrom(
         |      new java.io.ByteArrayInputStream($bytesRef));
         |  } catch (java.io.IOException e) {
         |    throw new RuntimeException("graft_bloom_contains: bad filter", e);
         |  }
         |}
         |${ev.value} = $bloomVar.mightContainLong((long)($c));
       """.stripMargin
    })
  }

  // Case-class equality over Array[Byte] is REFERENCE equality, so two
  // semantically identical probes would never compare equal — breaking
  // canonicalization/semanticEquals and plan-level common-subexpression
  // elimination. Compare the filter CONTENT instead.
  override def equals(other: Any): Boolean = other match {
    case b: BloomMightContain =>
      child == b.child && java.util.Arrays.equals(bloomBytes, b.bloomBytes)
    case _ => false
  }

  override def hashCode(): Int =
    31 * child.hashCode() + java.util.Arrays.hashCode(bloomBytes)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
