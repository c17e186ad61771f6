package graft.operators

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.{Column, DataFrame}
import graft.functions.CmsEstimate

/** Count-Min sketch build + probe: approximate per-key frequencies with
  * sub-linear state.
  *
  * Scale shape: the build is one distributed aggregation
  * (`DataFrameStatFunctions.countMinSketch`: per-partition sketches merged
  * by counter ADDITION — commutative and associative, so the result is
  * independent of merge order), costing O(d·w) memory regardless of key
  * count or skew. The probe rides along as a few-KB expression, staying in
  * whole-stage codegen. This is the frequency twin of the Bloom semi-join
  * (membership) and Misra-Gries (top-k): use it when the question is "how
  * often, roughly, with one-sided error" — estimates never undercount and
  * overcount by at most eps·N with confidence 1-delta.
  */
object CountMin {

  /** Serialized sketch of `df.col(colName)` (integral keys). */
  def sketchBytes(df: DataFrame, colName: String,
      eps: Double, confidence: Double, seed: Int): Array[Byte] = {
    val cms = df.stat.countMinSketch(colName, eps, confidence, seed)
    val bos = new ByteArrayOutputStream()
    cms.writeTo(bos)
    bos.toByteArray
  }

  /** Frequency-estimate column for `key` against a built sketch. */
  def estimate(bytes: Array[Byte])(key: Column): Column =
    org.apache.spark.sql.GraftSqlBridge.column(CmsEstimate(
      org.apache.spark.sql.GraftSqlBridge.expression(key), bytes))
}
