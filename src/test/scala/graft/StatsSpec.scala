package graft

import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Closed-form checks for the statistics module (exact answers on
  * constructed inputs) and the NFC normalization expression.
  */
class StatsSpec extends SparkSpec {

  test("OLS on an exact line recovers slope and intercept, r2 = 1") {
    import spark.implicits._
    // y = 3x + 7 exactly; sums are integers, so the double tail is exact.
    val df = (0L to 10L).map(x => ("a", x, 3 * x + 7)).toDF("g", "x", "y")
    val sums = df.groupBy("g").agg(
      count(lit(1)).as("n"),
      sum("x").as("sx"), sum("y").as("sy"),
      sum(col("x") * col("x")).as("sxx"),
      sum(col("x") * col("y")).as("sxy"),
      sum(col("y") * col("y")).as("syy"))
    val n = col("n").cast("double")
    val cov = col("sxy").cast("double") - col("sx").cast("double") * col("sy").cast("double") / n
    val varx = col("sxx").cast("double") - col("sx").cast("double") * col("sx").cast("double") / n
    val vary = col("syy").cast("double") - col("sy").cast("double") * col("sy").cast("double") / n
    val slope = cov / varx
    val r = sums.select(slope.as("b"),
      ((col("sy").cast("double") - slope * col("sx").cast("double")) / n).as("a"),
      (cov * cov / (varx * vary)).as("r2")).collect().head
    assert(r.getDouble(0) == 3.0)
    assert(r.getDouble(1) == 7.0)
    assert(r.getDouble(2) == 1.0)
  }

  test("chi-square of an independent (outer-product) table is exactly 0") {
    import spark.implicits._
    // counts = rowWeight * colWeight -> expected == observed everywhere.
    val cells = (for (i <- 1 to 3; j <- 1 to 4) yield (s"r$i", j, i * j * 10L))
      .toDF("a", "b", "o")
    val rt = cells.groupBy("a").agg(sum("o").as("rt"))
    val ct = cells.groupBy("b").agg(sum("o").as("ct"))
    val joined = cells.join(rt, "a").join(ct, "b")
    val folded = joined.agg(sum("o").as("n"),
      array_sort(collect_list(struct(col("a"), col("b"), col("o"),
        col("rt"), col("ct")))).as("cs"))
    val chi2 = folded.select(
      aggregate(col("cs"), lit(0.0d), (acc, c) => {
        val e = c.getField("rt").cast("double") * c.getField("ct").cast("double") /
          col("n").cast("double")
        acc + (c.getField("o").cast("double") - e) *
          (c.getField("o").cast("double") - e) / e
      }).as("chi2")).collect().head.getDouble(0)
    assert(chi2 == 0.0)
  }

  test("q147 corr matrix emits 6 pairs with corr in [-1e6, 1e6]") {
    val out = queries.Stats.queries("q147_corr_matrix")(spark, "/root/testdata/sf0.001")
    val rows = out.collect()
    assert(rows.length == 6)
    rows.foreach { r =>
      val c = r.getLong(r.fieldIndex("corr_e6"))
      assert(c >= -1000000L && c <= 1000000L, s"corr out of range: $r")
    }
  }

  test("NFC recomposes combining marks and is identity on ASCII") {
    import spark.implicits._
    val df = Seq(("éclair", "plain ascii")).toDF("dec", "asc")
    val r = df.select(
      TextFunctions.nfc(col("dec")).as("n1"),
      length(TextFunctions.nfc(col("dec"))).as("l1"),
      TextFunctions.nfc(col("asc")).as("n2")).collect().head
    assert(r.getString(0) == "éclair")
    assert(r.getInt(1) == 6)
    assert(r.getString(2) == "plain ascii")
  }

  test("graft_nfc is registered in SQL and supports form argument") {
    val r = spark.sql(
      "SELECT graft_nfc('é'), graft_nfc('é', 'NFD')").collect().head
    assert(r.getString(0) == "é")
    assert(r.getString(1) == "é")
  }

  test("NFC expression stays in whole-stage codegen (no fallback)") {
    // spark.range, not a local Seq: LocalTableScan constant-folds and
    // never enters codegen at all.
    val df = spark.range(4)
      .select(TextFunctions.nfc(concat(lit("é"), col("id").cast("string"))))
    // `*(n)` is the WholeStageCodegen marker in the simple plan string; the
    // Project containing graft_nfc must carry it (a fallback would print a
    // bare Project).
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l =>
      l.contains("graft_nfc") && l.trim.startsWith("*(")), plan)
    assert(df.collect().map(_.getString(0)).toSeq ==
      (0 until 4).map(i => "é" + i))
  }
}
