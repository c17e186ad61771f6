package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodeGenerator, CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** `graft_dot(a, b)` — dot product of two numeric arrays as double, with
  * strictly sequential (index-order) accumulation.
  *
  * Bit-identical to the explicit left-associative 64-term chain the DuckDB
  * oracles spell out (a loop accumulates in the same order; the leading
  * `0.0 +` is exact in IEEE), but CONSTANT bytecode size: each inlined
  * chain costs ~3 KB of generated Java per use, and three of them in one
  * pair stage overflowed the JVM method limit into interpreted fallback
  * (the q86 lesson). The loop also keeps whole-stage codegen fused through
  * scan -> join -> score pipelines regardless of vector dimension.
  *
  * Element types may differ per side (float embeddings vs integer
  * micro-unit centroids); anything numeric upcasts to double. Null
  * ELEMENTS throw: ArrayData.getFloat on a null slot silently reads 0.0
  * in both interpreted and generated code, which would yield a plausible-
  * but-wrong partial dot — the exact failure mode the length-mismatch
  * THROW exists to prevent. The guard is emitted only when the static
  * element type admits nulls (`containsNull=true`, which parquet-read
  * float lists carry even when no element is ever null), so the proven-
  * non-null case pays nothing. Null ARRAYS propagate null. Mismatched
  * lengths THROW — a truncated embedding must not flow through as a
  * plausible partial dot (the old explicit element_at chain surfaced
  * those too).
  */
case class DotProductExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  private val okTypes: Set[DataType] =
    Set(FloatType, DoubleType, LongType, IntegerType)

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(l, _), ArrayType(r, _))
          if okTypes.contains(l) && okTypes.contains(r) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_dot expects two numeric arrays, got $l and $r")
    }

  private def containsNull(e: Expression): Boolean = e.dataType match {
    case ArrayType(_, cn) => cn
    case _ => false
  }

  private def elemType(e: Expression): DataType = e.dataType match {
    case ArrayType(et, _) => et
    case other => throw new IllegalArgumentException(
      s"graft_dot expects array children, got $other")
  }

  private def toDouble(arr: ArrayData, et: DataType, i: Int): Double = et match {
    case FloatType => arr.getFloat(i).toDouble
    case DoubleType => arr.getDouble(i)
    case LongType => arr.getLong(i).toDouble
    case IntegerType => arr.getInt(i).toDouble
    case other => throw new IllegalArgumentException(s"graft_dot: $other")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) throw new IllegalArgumentException(
      s"graft_dot: array length mismatch (${x.numElements()} vs ${y.numElements()})")
    val etL = elemType(left); val etR = elemType(right)
    val ckL = containsNull(left); val ckR = containsNull(right)
    val n = x.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      if ((ckL && x.isNullAt(i)) || (ckR && y.isNullAt(i)))
        throw new IllegalArgumentException(
          s"graft_dot: null array element at index $i")
      acc += toDouble(x, etL, i) * toDouble(y, etR, i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val getA = CodeGenerator.getValue(a, elemType(left), i)
      val getB = CodeGenerator.getValue(b, elemType(right), i)
      val nullGuard = (if (containsNull(left)) s"$a.isNullAt($i)" else "") match {
        case "" if !containsNull(right) => ""
        case "" => s"$b.isNullAt($i)"
        case l if containsNull(right) => s"$l || $b.isNullAt($i)"
        case l => l
      }
      val guardCode = if (nullGuard.isEmpty) "" else
        s"""if ($nullGuard) {
           |  throw new IllegalArgumentException(
           |    "graft_dot: null array element at index " + $i);
           |}""".stripMargin
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  throw new IllegalArgumentException(
         |    "graft_dot: array length mismatch (" + $a.numElements() +
         |    " vs " + $b.numElements() + ")");
         |}
         |int $n = $a.numElements();
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $guardCode
         |  $acc += ((double)($getA)) * ((double)($getB));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
