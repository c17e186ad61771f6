package graft

import org.apache.spark.sql.functions._

/** Misra-Gries heavy hitters (custom TypedImperativeAggregate): exactness
  * when capacity covers the domain, the frequent-item guarantee under
  * eviction and multi-partition merges, and the SQL registration.
  */
class SketchSpec extends SparkSpec {

  test("capacity >= domain: estimates are exact under any partitioning") {
    import spark.implicits._
    val data = (1 to 1000).map(i => s"t${i % 7}").toDF("term").repartition(8)
    val rows = data
      .select(explode(expr("graft_heavy_hitters(term, 50)")).as("e"))
      .select($"e.term", $"e.est").as[(String, Long)].collect().toMap
    val exact = (1 to 1000).groupBy(_ % 7)
      .map { case (j, v) => s"t$j" -> v.size.toLong }
    assert(rows == exact, rows.toString)
  }

  test("eviction: true heavy hitter survives a capacity-3 sketch with error <= n/(k+1)") {
    import spark.implicits._
    // 600 of "hot", 1 each of 400 distinct cold terms; n = 1000, k = 3:
    // anything with freq > 250 must be present with est >= freq - 250
    val hot = Seq.fill(600)("hot")
    val cold = (1 to 400).map(i => s"cold$i")
    val data = scala.util.Random.shuffle(hot ++ cold).toDF("term").repartition(8)
    val rows = data
      .select(explode(expr("graft_heavy_hitters(term, 3)")).as("e"))
      .select($"e.term", $"e.est").as[(String, Long)].collect().toMap
    assert(rows.contains("hot"), rows.toString)
    assert(rows("hot") <= 600L && rows("hot") >= 600L - 1000L / 4, rows.toString)
  }

  test("sketch size never exceeds k") {
    import spark.implicits._
    val data = (1 to 5000).map(i => s"u$i").toDF("term").repartition(16)
    val n = data.select(size(expr("graft_heavy_hitters(term, 10)")))
      .collect().head.getInt(0)
    assert(n <= 10, s"sketch holds $n > k entries")
  }

  test("grouped usage: one sketch per group") {
    import spark.implicits._
    val data = Seq(("a", "x"), ("a", "x"), ("a", "y"), ("b", "z"))
      .toDF("g", "term")
    val out = data.groupBy("g")
      .agg(expr("graft_heavy_hitters(term, 5)").as("hh"))
      .select($"g", size($"hh").as("n")).as[(String, Int)].collect().toMap
    assert(out == Map("a" -> 2, "b" -> 1), out.toString)
  }

  test("count-min: never undercounts, bounded overcount, partition-independent") {
    import spark.implicits._
    import graft.operators.CountMin
    // skewed keys: key i occurs i times, n = 5050
    val data = (1L to 100L).flatMap(i => Seq.fill(i.toInt)(i)).toDF("k")
    val eps = 0.01
    val bytes = CountMin.sketchBytes(data.repartition(8), "k", eps, 0.99, 42)
    val est = data.distinct()
      .withColumn("est", CountMin.estimate(bytes)(col("k")))
      .as[(Long, Long)].collect().toMap
    val n = 5050L
    for ((k, e) <- est) {
      assert(e >= k, s"undercount: key $k est $e")
      assert(e <= k + (eps * n).toLong + 1, s"overcount beyond eps*n: key $k est $e")
    }
    // additive merge: a different partitioning yields the SAME sketch
    val bytes2 = CountMin.sketchBytes(data.repartition(3), "k", eps, 0.99, 42)
    assert(java.util.Arrays.equals(bytes, bytes2),
      "CMS must be merge-order independent")
  }

  test("count-min probe expressions are content-equal and CSE-able") {
    import spark.implicits._
    import org.apache.spark.sql.GraftSqlBridge
    import graft.operators.CountMin
    val data = (1L to 50L).toDF("k")
    val b1 = CountMin.sketchBytes(data, "k", 0.01, 0.99, 7)
    val b2 = b1.clone()
    val e1 = GraftSqlBridge.expression(CountMin.estimate(b1)(col("k")))
    val e2 = GraftSqlBridge.expression(CountMin.estimate(b2)(col("k")))
    assert(e1 == e2 && e1.hashCode == e2.hashCode && e1.semanticEquals(e2))
  }
}
