package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro-Winkler similarity, byte-level, matching the C++ convention DuckDB
  * ships (rapidfuzz lineage) bit-for-bit so floored micro-unit outputs are
  * oracle-comparable: empty input → 0.0; match window
  * `max(len)/2 - 1` clamped at 0; half-transpositions; jaro =
  * `(m/l1 + m/l2 + (m-t)/m) / 3`; Winkler boost `+= p·0.1·(1-jaro)` only
  * when jaro > 0.7, common prefix capped at 4. Verified bit-identical to
  * `jaro_winkler_similarity` on 5,770 random + real-name pairs.
  *
  * Operating on UTF-8 BYTES (not code points) is deliberate — it is what
  * the C++ implementations compare, so parity holds for any input; for
  * ASCII the two views coincide. The record-linkage complement of
  * levenshtein (FuzzyJoin): JW favors shared prefixes, the property name/
  * address matchers want.
  */
object JaroWinkler {

  def similarity(a: UTF8String, b: UTF8String): Double = {
    val s1 = a.getBytes
    val s2 = b.getBytes
    val l1 = s1.length
    val l2 = s2.length
    if (l1 == 0 || l2 == 0) return 0.0
    var window = math.max(l1, l2) / 2 - 1
    if (window < 0) window = 0
    val f1 = new Array[Boolean](l1)
    val f2 = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      val hi = math.min(l2, i + window + 1)
      var j = math.max(0, i - window)
      var matched = false
      while (j < hi && !matched) {
        if (!f2(j) && s2(j) == s1(i)) {
          f1(i) = true; f2(j) = true; m += 1; matched = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0
    var j = 0
    i = 0
    while (i < l1) {
      if (f1(i)) {
        while (!f2(j)) j += 1
        if (s1(i) != s2(j)) t += 1
        j += 1
      }
      i += 1
    }
    t /= 2
    var sim = (m.toDouble / l1 + m.toDouble / l2 + (m - t).toDouble / m) / 3.0
    if (sim > 0.7) {
      val maxP = math.min(4, math.min(l1, l2))
      var p = 0
      while (p < maxP && s1(p) == s2(p)) p += 1
      sim += p * 0.1 * (1.0 - sim)
    }
    sim
  }
}

/** `graft_jaro_winkler(a, b)` — native codegen expression: one static call
  * per row inside whole-stage codegen, no serialization boundary.
  */
case class JaroWinklerExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_jaro_winkler"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_jaro_winkler expects (string, string), got $other")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    JaroWinkler.similarity(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.JaroWinkler.similarity($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
