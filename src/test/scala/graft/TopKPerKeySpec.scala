package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.plans.TopKPerKey

/** The custom top-k-per-key physical operator must agree exactly with the
  * window row_number form on a total order, and its plan must show the
  * two-phase (partial + final) shape with an exchange between.
  */
class TopKPerKeySpec extends SparkSpec {

  def orders() = {
    val sf = "/root/testdata/sf0.001"
    spark.read.parquet(s"$sf/orders.parquet")
  }

  test("matches window row_number <= k on a total order") {
    val k = 3
    val custom = TopKPerKey(orders(), Seq("o_custkey"),
        Seq(desc("o_totalprice"), asc("o_orderkey")), k)
      .select("o_custkey", "o_orderkey")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val w = Window.partitionBy("o_custkey").orderBy(desc("o_totalprice"), asc("o_orderkey"))
    val windowed = orders()
      .withColumn("rn", row_number().over(w)).where(col("rn") <= k)
      .select("o_custkey", "o_orderkey")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(custom.nonEmpty)
    assert(custom == windowed)
  }

  test("k larger than group size keeps everything") {
    import spark.implicits._
    val df = Seq((1L, 10.0, 1L), (1L, 20.0, 2L), (2L, 5.0, 3L)).toDF("k", "v", "id")
    val out = TopKPerKey(df, Seq("k"), Seq(desc("v"), asc("id")), 5)
      .select("id").as[Long].collect().toSet
    assert(out == Set(1L, 2L, 3L))
  }

  test("plan shows partial and final TopKPerKeyExec with an exchange between") {
    val p = TopKPerKey(orders(), Seq("o_custkey"),
      Seq(desc("o_totalprice"), asc("o_orderkey")), 3)
      .queryExecution.executedPlan.toString
    assert("TopKPerKey ".r.findAllIn(p).length >= 2, p)
    assert(p.contains("Exchange"), p)
    assert(!p.contains("Sort "), p) // no full sort anywhere
  }
}
