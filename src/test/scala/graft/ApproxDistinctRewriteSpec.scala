package graft

import org.apache.spark.sql.functions._

/** The CountDistinctToHll optimizer rule (opt-in via
  * spark.sql.graft.approxDistinct): when enabled, exact count(DISTINCT x)
  * must produce EXACTLY what the user would get writing
  * approx_count_distinct(x, rsd) by hand — the rule is a substitution, so
  * that equality (not an error band) is the contract. Aliases and FILTER
  * clauses survive; multi-argument distinct counts are left exact. When
  * the flag is off (the default), counts stay exact.
  */
class ApproxDistinctRewriteSpec extends SparkSpec {

  private def withRewrite[A](body: => A): A = {
    spark.conf.set(graft.plans.CountDistinctToHll.ConfKey, "true")
    try body
    finally spark.conf.unset(graft.plans.CountDistinctToHll.ConfKey)
  }

  private def sample = {
    import spark.implicits._
    (0 until 5000).map(i => (i % 7, (i * 13) % 900, i.toLong))
      .toDF("g", "v", "id")
  }

  test("flag off: count distinct stays exact, no sketch in the plan") {
    val df = sample.groupBy("g").agg(countDistinct("v").as("nd"))
    val plan = df.queryExecution.executedPlan.toString.toLowerCase
    assert(!plan.contains("hyperloglog") && !plan.contains("approx_count"),
      plan)
    // v is distinct within each group (13*7 steps don't cycle inside 900),
    // so exact nd == the group's row count
    import spark.implicits._
    val exact = sample.groupBy("g").count()
      .as[(Int, Long)].collect().toSet
    assert(df.as[(Int, Long)].collect().toSet == exact)
  }

  test("flag on: plans the HLL++ aggregate and equals hand-written approx_count_distinct") {
    withRewrite {
      import spark.implicits._
      val rewritten = sample.groupBy("g").agg(countDistinct("v").as("nd"))
      val plan = rewritten.queryExecution.executedPlan.toString.toLowerCase
      assert(plan.contains("hyperloglog") || plan.contains("approx_count"),
        plan)
      val byHand = sample.groupBy("g")
        .agg(approx_count_distinct("v", 0.05).as("nd"))
      assert(rewritten.as[(Int, Long)].collect().toSet ==
        byHand.as[(Int, Long)].collect().toSet)
    }
  }

  test("flag on: FILTER clause survives; multi-arg distinct stays exact") {
    withRewrite {
      val filtered = sample
        .agg(expr("count(DISTINCT v) FILTER (WHERE g = 0)").as("nd0"))
        .head.getLong(0)
      val byHand = sample
        .agg(expr("approx_count_distinct(v, 0.05) FILTER (WHERE g = 0)"))
        .head.getLong(0)
      assert(filtered == byHand, s"$filtered vs $byHand")

      val multi = sample.agg(countDistinct(col("g"), col("v")).as("nd2"))
      val plan = multi.queryExecution.executedPlan.toString.toLowerCase
      assert(!plan.contains("hyperloglog") && !plan.contains("approx_count"),
        plan) // untouched: stays exact
      assert(multi.head.getLong(0) == 5000L) // all (g, v) pairs distinct
    }
  }
}
