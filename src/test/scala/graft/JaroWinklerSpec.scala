package graft

import org.apache.spark.sql.functions._
import graft.functions.{JaroWinkler, TextFunctions}
import org.apache.spark.unsafe.types.UTF8String

/** The native graft_jaro_winkler expression: canonical literature values,
  * the C++-convention edge cases (empty → 0, window-0 short strings), and
  * interpreted-vs-codegen agreement through a real plan.
  */
class JaroWinklerSpec extends SparkSpec {

  private def jw(a: String, b: String): Double =
    JaroWinkler.similarity(UTF8String.fromString(a), UTF8String.fromString(b))

  test("canonical values match the published Jaro-Winkler examples") {
    assert(math.abs(jw("MARTHA", "MARHTA") - 0.9611111111111111) < 1e-15)
    assert(math.abs(jw("DWAYNE", "DUANE") - 0.8400000000000001) < 1e-15)
    assert(math.abs(jw("DIXON", "DICKSONX") - 0.8133333333333332) < 1e-15)
    // jaro 0.7333 > 0.7 but zero common prefix -> no boost
    assert(math.abs(jw("CRATE", "TRACE") - 0.7333333333333334) < 1e-15)
  }

  test("C++-convention edges: empty is 0, window-0 pairs, identity, case") {
    assert(jw("", "") == 0.0)
    assert(jw("", "abc") == 0.0)
    assert(jw("a", "b") == 0.0)
    assert(jw("ab", "ba") == 0.0) // window max(2,2)/2-1 = 0: no cross match
    assert(jw("abc", "abc") == 1.0)
    assert(jw("martha", "MARTHA") == 0.0) // byte-level, case-sensitive
  }

  test("codegen path equals interpreted eval and stays UDF-free") {
    import spark.implicits._
    val pairs = Seq(("MARTHA", "MARHTA"), ("DWAYNE", "DUANE"),
      ("", ""), ("ab", "ba"), ("Customer#000000001", "Customer#000000011"))
    val df = pairs.toDF("a", "b")
      .select(TextFunctions.jaroWinkler(col("a"), col("b")).as("jw"))
    val fromPlan = df.collect().map(_.getDouble(0)).toSeq
    assert(fromPlan == pairs.map { case (a, b) => jw(a, b) })
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("scalaudf"), plan)
    // SQL registration round-trip (GraftExtensions)
    val viaSql = spark.sql(
      "SELECT graft_jaro_winkler('MARTHA', 'MARHTA')").head.getDouble(0)
    assert(viaSql == jw("MARTHA", "MARHTA"))
  }
}
