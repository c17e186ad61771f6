package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The WindowTopKToTopKPerKey optimizer rule (opt-in via
  * spark.sql.graft.topkRewrite): when enabled, the stock
  * row_number-filter-drop idiom must plan as the bounded-heap operator
  * (and produce identical rows), while shapes the rewrite cannot cover —
  * rank kept, no partitioning — must keep their Window. When the flag is
  * off (the default), nothing rewrites.
  */
class TopKRewriteSpec extends SparkSpec {

  private def withRewrite[A](body: => A): A = {
    spark.conf.set(graft.plans.WindowTopKToTopKPerKey.ConfKey, "true")
    try body
    finally spark.conf.unset(graft.plans.WindowTopKToTopKPerKey.ConfKey)
  }

  private def sample = {
    import spark.implicits._
    // 3 keys x 40 rows, unique (v, id) per key for a total order
    (0 until 120).map(i => (i % 3, (i * 7919) % 120, i.toLong))
      .toDF("k", "v", "id")
  }

  private def expectedTop(n: Int): Set[(Int, Int, Long)] = {
    import spark.implicits._
    sample.as[(Int, Int, Long)].collect().toSeq
      .groupBy(_._1).values
      .flatMap(_.sortBy(r => (-r._2, r._3)).take(n))
      .toSet
  }

  test("row_number filter+drop rewrites to TopKPerKey and matches the window result") {
    withRewrite {
    import spark.implicits._
    val w = Window.partitionBy("k").orderBy(desc("v"), asc("id"))
    val df = sample.withColumn("rn", row_number().over(w))
      .where(col("rn") <= 3).drop("rn")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"), plan)
    assert(!plan.contains("Window"), plan)
    assert(df.as[(Int, Int, Long)].collect().toSet == expectedTop(3))
    }
  }

  test("argmax form rn = 1 rewrites with k = 1") {
    withRewrite {
    import spark.implicits._
    val w = Window.partitionBy("k").orderBy(desc("v"), asc("id"))
    val df = sample.withColumn("rn", row_number().over(w))
      .where(col("rn") === 1).drop("rn")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"), plan)
    assert(!plan.contains("Window"), plan)
    assert(df.as[(Int, Int, Long)].collect().toSet == expectedTop(1))
    }
  }

  test("extra filter conjuncts survive above the operator") {
    withRewrite {
    import spark.implicits._
    val w = Window.partitionBy("k").orderBy(desc("v"), asc("id"))
    val df = sample.withColumn("rn", row_number().over(w))
      .where(col("rn") <= 5 && col("v") % 2 === 0).drop("rn")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"), plan)
    assert(!plan.contains("Window"), plan)
    val expected = expectedTop(5).filter(_._2 % 2 == 0)
    assert(df.as[(Int, Int, Long)].collect().toSet == expected)
    }
  }

  test("rank column kept downstream: no rewrite, Window stays") {
    withRewrite {
    val w = Window.partitionBy("k").orderBy(desc("v"), asc("id"))
    val df = sample.withColumn("rn", row_number().over(w))
      .where(col("rn") <= 3) // rn still in the output
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("Window"), plan)
    assert(!plan.contains("TopKPerKey"), plan)
    }
  }

  test("global (unpartitioned) row_number: no rewrite") {
    withRewrite {
    val w = Window.orderBy(desc("v"), asc("id"))
    val df = sample.withColumn("rn", row_number().over(w))
      .where(col("rn") <= 3).drop("rn")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("TopKPerKey"), plan)
    }
  }

  test("flag off (default): the idiom keeps its Window") {
    val w = Window.partitionBy("k").orderBy(desc("v"), asc("id"))
    val df = sample.withColumn("rn", row_number().over(w))
      .where(col("rn") <= 3).drop("rn")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("Window"), plan)
    assert(!plan.contains("TopKPerKey"), plan)
  }
}
