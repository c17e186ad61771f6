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

  test("degenerate groups yield NULL, not Infinity/NaN (oracle parity)") {
    import spark.implicits._
    // a 1-event type (Welch n-1 = 0), a constant type on one day (varx =
    // vary = 0), and a varied type — through the REAL queries via a temp
    // events.parquet in the driver schema.
    val dir = java.nio.file.Files.createTempDirectory("graft_stats").toString
    def ts(day: Int, h: Int) =
      java.sql.Timestamp.valueOf(f"2024-01-$day%02d $h%02d:00:00")
    val rows = Seq(
      (1L, ts(1, 1), 1L, "solo", 5.0, "{}"),
      (2L, ts(1, 1), 1L, "const", 7.0, "{}"),
      (3L, ts(1, 2), 1L, "const", 7.0, "{}"),
      (4L, ts(1, 3), 2L, "const", 7.0, "{}"),
      (5L, ts(1, 1), 2L, "vary", 1.0, "{}"),
      (6L, ts(2, 1), 3L, "vary", 9.0, "{}"),
      (7L, ts(3, 1), 3L, "vary", 4.0, "{}"),
      (8L, ts(1, 4), 4L, "also7", 7.0, "{}"),
      (9L, ts(1, 5), 4L, "also7", 7.0, "{}"))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")

    val t = queries.Stats.queries("q161_ttest")(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.isNullAt(2)).toMap
    assert(t.size == 6, t.toString)
    assert(t(("const", "solo")), "solo side must be NULL (n=1)")
    assert(t(("also7", "const")), "both variances 0 must be NULL (den=0)")
    assert(t(("solo", "vary")), "solo side must be NULL (n=1)")
    // one-sided zero variance is NOT degenerate: den2 > 0
    assert(!t(("const", "vary")), "const-vs-vary must compute a t value")

    val ols = queries.Stats.queries("q146_ols_group")(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(ols("const").isNullAt(ols("const").fieldIndex("slope_e6")),
      "constant-x group slope must be NULL")
    assert(ols("solo").isNullAt(ols("solo").fieldIndex("r2_e6")),
      "single-point group r2 must be NULL")
    assert(!ols("vary").isNullAt(ols("vary").fieldIndex("slope_e6")))
  }

  test("power iteration converges to the dominant (price) direction") {
    val r = queries.Stats.queries("q172_power_iteration")(spark, "/root/testdata/sf0.001")
      .collect().head
    // price variance (~1e10) dwarfs the others: the first PC must be the
    // price axis, so pc_1 is the max-abs component (exactly +-1e6).
    assert(math.abs(r.getLong(r.fieldIndex("pc_1"))) == 1000000L, r.toString)
    assert(math.abs(r.getLong(r.fieldIndex("pc_0"))) < 1000000L, r.toString)
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
