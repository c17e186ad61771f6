package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.CountMinSketch

/** `graft_cms_estimate(key)` — frequency estimate of an integral key
  * against a pre-built Count-Min sketch.
  *
  * The sketch is the mergeable-counter answer to "how often does each of
  * these keys occur in 100 TB": d×w integer counters built in one
  * distributed pass (`DataFrameStatFunctions.countMinSketch` merges
  * per-partition sketches ADDITIVELY, so unlike Misra-Gries the estimate
  * is independent of Spark's merge order), probed here as a per-row
  * expression. Guarantees, not exactness: estimate >= true count always;
  * estimate <= true count + eps*N with confidence 1-delta.
  *
  * Same execution shape as [[BloomMightContain]]: the serialized sketch
  * travels as bytes, is deserialized once per task into generated-class
  * state, and the per-row probe stays inside whole-stage codegen.
  */
case class CmsEstimate(child: Expression, cmsBytes: Array[Byte])
    extends UnaryExpression {

  override def prettyName: String = "graft_cms_estimate"
  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_cms_estimate expects an integral key, got $other")
  }

  @transient private lazy val cms: CountMinSketch =
    CountMinSketch.readFrom(new ByteArrayInputStream(cmsBytes))

  override protected def nullSafeEval(v: Any): Any = child.dataType match {
    case LongType => cms.estimateCount(v.asInstanceOf[Long])
    case _ => cms.estimateCount(v.asInstanceOf[Int].toLong)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bytesRef = ctx.addReferenceObj("cmsBytes", cmsBytes, "byte[]")
    val cmsCls = classOf[CountMinSketch].getName
    val cmsVar = ctx.addMutableState(cmsCls, "graftCms")
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |if ($cmsVar == null) {
         |  try {
         |    $cmsVar = $cmsCls.readFrom(
         |      new java.io.ByteArrayInputStream($bytesRef));
         |  } catch (java.io.IOException e) {
         |    throw new RuntimeException("graft_cms_estimate: bad sketch", e);
         |  }
         |}
         |${ev.value} = $cmsVar.estimateCount(java.lang.Long.valueOf((long)($c)));
       """.stripMargin
    })
  }

  // Content-based equality over the sketch bytes (the BloomMightContain
  // lesson): case-class equality on Array[Byte] is reference equality,
  // which silently disables canonicalization and CSE.
  override def equals(other: Any): Boolean = other match {
    case e: CmsEstimate =>
      child == e.child && java.util.Arrays.equals(cmsBytes, e.cmsBytes)
    case _ => false
  }

  override def hashCode(): Int =
    31 * child.hashCode() + java.util.Arrays.hashCode(cmsBytes)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
