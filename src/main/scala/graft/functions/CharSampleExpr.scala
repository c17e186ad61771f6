package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `graft_char_sample(str, cells)` — the code points at `cells` evenly
  * spaced positions of a string (0-based code-point index (i·n) div cells),
  * as one native O(n) pass.
  *
  * This is the downsampling stub behind the perceptual-hash family
  * (q355/q356): composing it from per-cell `substr(text, pos, 1)` costs an
  * O(pos) code-point seek PER CELL (UTF8String has no random access), i.e.
  * O(cells·n) per row — measured as ~half of q355's sf1 wall; pre-splitting
  * with `split(text, '')` is one pass but allocates an n-element string
  * array per row and measured 3× WORSE. The native expression walks the
  * code points once, picks the requested positions on the way (targets are
  * nondecreasing), and allocates only the fixed-size output. Value parity
  * with `ascii(substr(str, 1 + (i·length) div cells, 1))` — the exact SQL
  * both DuckDB and Spark agree on — is what the q355/q356 oracles replay.
  */
case class CharSampleExpr(child: Expression, cells: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_char_sample"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if cells > 0 => TypeCheckResult.TypeCheckSuccess
    case StringType => TypeCheckResult.TypeCheckFailure(
      "graft_char_sample cells must be a positive integer literal")
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_char_sample expects a string, got $other")
  }

  override protected def nullSafeEval(s: Any): Any =
    CharSampleExpr.sample(s.asInstanceOf[UTF8String], cells)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.CharSampleExpr.sample($c, $cells);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CharSampleExpr {
  /** One forward walk: java char index advances with Character.charCount so
    * supplementary-plane code points keep the same indexing as SQL substr
    * (which counts code points, not UTF-16 units). Empty input yields all
    * zeros — the ascii('') = 0 convention both engines share.
    */
  def sample(u: UTF8String, cells: Int): ArrayData = {
    val s = u.toString
    val n = s.codePointCount(0, s.length)
    val out = new Array[Long](cells)
    if (n > 0) {
      var cp = 0 // code-point index of java index j
      var j = 0
      var i = 0
      while (i < cells) {
        val target = ((i.toLong * n) / cells).toInt
        while (cp < target) {
          j += Character.charCount(s.codePointAt(j)); cp += 1
        }
        out(i) = s.codePointAt(j).toLong
        i += 1
      }
    }
    new GenericArrayData(out)
  }
}
