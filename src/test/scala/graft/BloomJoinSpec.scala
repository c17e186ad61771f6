package graft

import org.apache.spark.sql.functions._
import graft.operators.BloomJoin

/** Bloom semi-join reduction: the probe can never drop a true match (no
  * false negatives), the composed operator equals the plain semi join
  * row-for-row, and the probe stays a codegen-friendly filter (no UDF).
  */
class BloomJoinSpec extends SparkSpec {

  test("probe has no false negatives over the built key set") {
    import spark.implicits._
    val keys = (1L to 5000L by 7).toDF("k")
    val probe = BloomJoin.bloomProbe(keys, "k", 1000L, 0.03) _
    val dropped = keys.where(!probe(col("k"))).count()
    assert(dropped == 0L, s"$dropped true keys dropped by the Bloom probe")
  }

  test("semiJoinReduced equals the plain left_semi join") {
    import spark.implicits._
    val big = (1L to 10000L).map(i => (i, s"p$i")).toDF("id", "payload")
    val small = (1L to 10000L by 13).toDF("sid")
    val reduced = BloomJoin.semiJoinReduced(big, small, "id", "sid", 1000L, 0.05)
    val plain = big.join(small.select(col("sid").as("id")), Seq("id"), "left_semi")
    assert(reduced.count() == plain.count())
    assert(reduced.exceptAll(plain).count() == 0L)
    assert(plain.exceptAll(reduced).count() == 0L)
  }

  test("probes with equal filter content are equal expressions (CSE-able)") {
    import spark.implicits._
    import org.apache.spark.sql.GraftSqlBridge
    // two independently built probes over the same key set: byte-equal
    // filters in distinct arrays. Case-class equality over Array[Byte] is
    // reference equality, which would silently disable canonicalization
    // and common-subexpression elimination — equality must be by CONTENT.
    val keys = (1L to 100L).toDF("k")
    val e1 = GraftSqlBridge.expression(
      BloomJoin.bloomProbe(keys, "k", 100L, 0.03)(col("k")))
    val e2 = GraftSqlBridge.expression(
      BloomJoin.bloomProbe(keys, "k", 100L, 0.03)(col("k")))
    assert(e1 ne e2)
    assert(e1 == e2, "content-equal Bloom probes must compare equal")
    assert(e1.hashCode == e2.hashCode)
    assert(e1.semanticEquals(e2))
  }

  test("probe is a plan-level filter on the scan, not a UDF node") {
    // file-backed input: over a LocalRelation Catalyst would fold the
    // probe away at optimize time (ConvertToLocalRelation), hiding the
    // plan shape this asserts
    val sf = "/root/testdata/sf0.001"
    val orders = graft.core.Tables(spark, sf, "orders")
    val cust = graft.core.Tables(spark, sf, "customer")
      .where(org.apache.spark.sql.functions.col("c_nationkey") === 5)
    val p = BloomJoin.semiJoinReduced(orders, cust, "o_custkey", "c_custkey",
        1000L, 0.05)
      .queryExecution.executedPlan.toString
    assert(p.contains("graft_bloom_contains"), p)
    assert(!p.toLowerCase.contains("scalaudf"), p)
  }
}
