package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.PrefixScan

/** PrefixScan ≡ the single-partition window form, proven on data forced
  * across multiple partitions (the whole point of the operator is that
  * partition boundaries stitch correctly via the offset pass).
  */
class PrefixScanSpec extends SparkSpec {
  import spark.implicits._

  private def data = Seq(
    (5L, 10L), (1L, 40L), (3L, 20L), (2L, 35L), (4L, 15L),
    (7L, 5L), (6L, 50L), (9L, 1L), (8L, 30L), (10L, 25L))
    .toDF("k", "v")
    .repartition(4) // force partition-boundary stitching

  test("inclusive sum scan equals the window running total") {
    val got = PrefixScan.scanLong(data, "cum", "v", "sum",
        inclusive = true, asc("k"))
      .select("k", "cum").as[(Long, Long)].collect().sortBy(_._1)
    val w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, 0)
    val want = data.withColumn("cum", sum("v").over(w))
      .select("k", "cum").as[(Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq == want.toSeq)
  }

  test("exclusive min scan equals the window min over strictly-preceding " +
      "rows (identity MaxValue on the first row)") {
    val got = PrefixScan.scanLong(data, "m", "v", "min",
        inclusive = false, asc("k"))
      .select("k", "m").as[(Long, Long)].collect().sortBy(_._1)
    val w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, -1)
    val want = data.withColumn("m", coalesce(min("v").over(w),
        lit(Long.MaxValue)))
      .select("k", "m").as[(Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq == want.toSeq)
  }

  test("empty input yields empty output") {
    val empty = data.where(lit(false))
    assert(PrefixScan.scanLong(empty, "cum", "v", "sum",
      inclusive = true, asc("k")).count() == 0L)
  }

  // keyed data: 3 keys × 40 rows, shuffled across 8 partitions so keys
  // straddle multiple partition boundaries after the range sort
  private def keyed = (1 to 120).map { i =>
    (s"k${i % 3}", i.toLong, ((i * 37) % 100).toLong)
  }.toDF("g", "ord", "v").repartition(8)

  test("keyed inclusive sum+count scan equals the keyed window form") {
    val got = PrefixScan.scanLongKeyed(keyed, Seq("g"),
        Seq(PrefixScan.KeyedScanCol("cum", "v", "sum"),
          PrefixScan.KeyedScanCol("rn", "", "count")),
        asc("ord"))
      .select("g", "ord", "cum", "rn")
      .as[(String, Long, Long, Long)].collect().sortBy(r => (r._1, r._2))
    val w = Window.partitionBy("g").orderBy("ord")
      .rowsBetween(Window.unboundedPreceding, 0)
    val want = keyed
      .withColumn("cum", sum("v").over(w))
      .withColumn("rn", row_number().over(
        Window.partitionBy("g").orderBy("ord")).cast("long"))
      .select("g", "ord", "cum", "rn")
      .as[(String, Long, Long, Long)].collect().sortBy(r => (r._1, r._2))
    assert(got.toSeq == want.toSeq)
  }

  test("keyed exclusive min scan equals the keyed window over " +
      "strictly-preceding rows") {
    val got = PrefixScan.scanLongKeyed(keyed, Seq("g"),
        Seq(PrefixScan.KeyedScanCol("m", "v", "min", inclusive = false)),
        asc("ord"))
      .select("g", "ord", "m")
      .as[(String, Long, Long)].collect().sortBy(r => (r._1, r._2))
    val w = Window.partitionBy("g").orderBy("ord")
      .rowsBetween(Window.unboundedPreceding, -1)
    val want = keyed
      .withColumn("m", coalesce(min("v").over(w), lit(Long.MaxValue)))
      .select("g", "ord", "m")
      .as[(String, Long, Long)].collect().sortBy(r => (r._1, r._2))
    assert(got.toSeq == want.toSeq)
  }

  test("keyed inclusive+exclusive max scan equals the keyed window forms") {
    val got = PrefixScan.scanLongKeyed(keyed, Seq("g"),
        Seq(PrefixScan.KeyedScanCol("mi", "v", "max"),
          PrefixScan.KeyedScanCol("mx", "v", "max", inclusive = false)),
        asc("ord"))
      .select("g", "ord", "mi", "mx")
      .as[(String, Long, Long, Long)].collect().sortBy(r => (r._1, r._2))
    val wi = Window.partitionBy("g").orderBy("ord")
      .rowsBetween(Window.unboundedPreceding, 0)
    val wx = Window.partitionBy("g").orderBy("ord")
      .rowsBetween(Window.unboundedPreceding, -1)
    val want = keyed
      .withColumn("mi", max("v").over(wi))
      .withColumn("mx", coalesce(max("v").over(wx), lit(Long.MinValue)))
      .select("g", "ord", "mi", "mx")
      .as[(String, Long, Long, Long)].collect().sortBy(r => (r._1, r._2))
    assert(got.toSeq == want.toSeq)
  }

  test("keyed maxsum scan equals running max of the window running sum") {
    // signed values so the prefix path actually goes up AND down
    val signed = keyed.withColumn("v", col("v") - 50L)
    val got = PrefixScan.scanLongKeyed(signed, Seq("g"),
        Seq(PrefixScan.KeyedScanCol("peak", "v", "maxsum")),
        asc("ord"))
      .select("g", "ord", "peak")
      .as[(String, Long, Long)].collect().sortBy(r => (r._1, r._2))
    val w = Window.partitionBy("g").orderBy("ord")
      .rowsBetween(Window.unboundedPreceding, 0)
    val want = signed
      .withColumn("cum", sum("v").over(w))
      .withColumn("peak", max("cum").over(w))
      .select("g", "ord", "peak")
      .as[(String, Long, Long)].collect().sortBy(r => (r._1, r._2))
    assert(got.toSeq == want.toSeq)
  }

  test("keyed islands scan equals the window lag+flag+cumsum island ids") {
    // ord as the position, gap threshold 7: the ord values within each
    // key are multiples of 3 (i%3 partitioning), so both merged and
    // split boundaries occur across the 8 partitions
    val got = PrefixScan.scanLongKeyed(keyed, Seq("g"),
        Seq(PrefixScan.KeyedScanCol("isl", "ord", "islands", param = 7L)),
        asc("ord"))
      .select("g", "ord", "isl")
      .as[(String, Long, Long)].collect().sortBy(r => (r._1, r._2))
    val w = Window.partitionBy("g").orderBy("ord")
    val cum = Window.partitionBy("g").orderBy("ord")
      .rowsBetween(Window.unboundedPreceding, 0)
    val want = keyed
      .withColumn("nb", when(lag("ord", 1).over(w).isNull ||
        col("ord") - lag("ord", 1).over(w) > 7L, 1L).otherwise(0L))
      .withColumn("isl", sum("nb").over(cum))
      .select("g", "ord", "isl")
      .as[(String, Long, Long)].collect().sortBy(r => (r._1, r._2))
    assert(got.toSeq == want.toSeq)
  }

  test("keyed islands scan with a sparse gap threshold splits correctly") {
    // threshold 2 with stride-3 positions: EVERY row is its own island
    val got = PrefixScan.scanLongKeyed(keyed, Seq("g"),
        Seq(PrefixScan.KeyedScanCol("isl", "ord", "islands", param = 2L)),
        asc("ord"))
      .select("g", "ord", "isl")
      .as[(String, Long, Long)].collect()
    val perKey = got.groupBy(_._1)
    for ((_, rows) <- perKey) {
      val sorted = rows.sortBy(_._2)
      assert(sorted.map(_._3).toSeq == (1L to sorted.length).toSeq)
    }
  }

  test("keyed lag equals the keyed window lag (null on first row per key)") {
    val got = PrefixScan.lagLongKeyed(keyed, "pv", "v", Seq("g"), asc("ord"))
      .select("g", "ord", "pv")
      .as[(String, Long, Option[Long])].collect().sortBy(r => (r._1, r._2))
    val w = Window.partitionBy("g").orderBy("ord")
    val want = keyed.withColumn("pv", lag("v", 1).over(w))
      .select("g", "ord", "pv")
      .as[(String, Long, Option[Long])].collect().sortBy(r => (r._1, r._2))
    assert(got.toSeq == want.toSeq)
  }

  test("empty keyCols degrade the keyed scan and lag to the GLOBAL forms") {
    val got = PrefixScan.scanLongKeyed(keyed, Seq.empty,
        Seq(PrefixScan.KeyedScanCol("cum", "v", "sum")), asc("ord"))
      .select("ord", "cum").as[(Long, Long)].collect().sortBy(_._1)
    val w = Window.orderBy("ord").rowsBetween(Window.unboundedPreceding, 0)
    val want = keyed.withColumn("cum", sum("v").over(w))
      .select("ord", "cum").as[(Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq == want.toSeq)
    val gotLag = PrefixScan.lagLongKeyed(keyed, "pv", "v", Seq.empty,
        asc("ord"))
      .select("ord", "pv").as[(Long, Option[Long])].collect().sortBy(_._1)
    val wantLag = keyed.withColumn("pv", lag("v", 1).over(Window.orderBy("ord")))
      .select("ord", "pv").as[(Long, Option[Long])].collect().sortBy(_._1)
    assert(gotLag.toSeq == wantLag.toSeq)
  }

  test("composite (two-column) keys scan and lag correctly") {
    val two = keyed.withColumn("g2", col("ord") % 2)
    val got = PrefixScan.scanLongKeyed(two, Seq("g", "g2"),
        Seq(PrefixScan.KeyedScanCol("cum", "v", "sum"),
          PrefixScan.KeyedScanCol("pk", "v", "maxsum", inclusive = false)),
        asc("ord"))
      .select("g", "g2", "ord", "cum", "pk")
      .as[(String, Long, Long, Long, Long)].collect()
      .sortBy(r => (r._1, r._2, r._3))
    val w = Window.partitionBy("g", "g2").orderBy("ord")
      .rowsBetween(Window.unboundedPreceding, 0)
    val wx = Window.partitionBy("g", "g2").orderBy("ord")
      .rowsBetween(Window.unboundedPreceding, -1)
    val want = two
      .withColumn("cum", sum("v").over(w))
      .withColumn("pk", coalesce(max("cum").over(wx), lit(Long.MinValue)))
      .select("g", "g2", "ord", "cum", "pk")
      .as[(String, Long, Long, Long, Long)].collect()
      .sortBy(r => (r._1, r._2, r._3))
    assert(got.toSeq == want.toSeq)
    val gotLag = PrefixScan.lagLongKeyed(two, "pv", "v", Seq("g", "g2"),
        asc("ord"))
      .select("g", "g2", "ord", "pv")
      .as[(String, Long, Long, Option[Long])].collect()
      .sortBy(r => (r._1, r._2, r._3))
    val wantLag = two.withColumn("pv",
        lag("v", 1).over(Window.partitionBy("g", "g2").orderBy("ord")))
      .select("g", "g2", "ord", "pv")
      .as[(String, Long, Long, Option[Long])].collect()
      .sortBy(r => (r._1, r._2, r._3))
    assert(gotLag.toSeq == wantLag.toSeq)
  }

  test("keyed scan on empty input yields empty output") {
    val empty = keyed.where(lit(false))
    assert(PrefixScan.scanLongKeyed(empty, Seq("g"),
      Seq(PrefixScan.KeyedScanCol("cum", "v", "sum")), asc("ord"))
      .count() == 0L)
    assert(PrefixScan.lagLongKeyed(empty, "pv", "v", Seq("g"), asc("ord"))
      .count() == 0L)
  }

  private def chainMessages(e: Throwable): String = {
    val sb = new StringBuilder
    var t = e
    while (t != null) { sb ++= Option(t.getMessage).getOrElse(""); t = t.getCause }
    sb.toString
  }

  private def highCard = (1 to 200).map(i => (i.toLong, i.toLong))
    .toDF("g", "v").repartition(4)

  test("per-partition key-cardinality guard fails INSIDE the pass-1 task " +
      "with a diagnostic (cap conf-overridable)") {
    spark.conf.set("spark.graft.prefixScan.maxPartitionKeyRuns", "2")
    try {
      val e = intercept[Throwable] {
        PrefixScan.scanLongKeyed(highCard, Seq("g"),
          Seq(PrefixScan.KeyedScanCol("cum", "v", "sum")), asc("v")).collect()
      }
      val m = chainMessages(e)
      assert(m.contains("distinct keys in one range partition"), m)
      assert(m.contains("key cardinality is not driver-bounded"), m)
    } finally spark.conf.unset("spark.graft.prefixScan.maxPartitionKeyRuns")
  }

  test("driver run-count backstop fails with a diagnostic (cap " +
      "conf-overridable)") {
    spark.conf.set("spark.graft.prefixScan.maxDriverKeyRuns", "4")
    try {
      val e = intercept[Throwable] {
        PrefixScan.scanLongKeyed(highCard, Seq("g"),
          Seq(PrefixScan.KeyedScanCol("cum", "v", "sum")), asc("v")).collect()
      }
      val m = chainMessages(e)
      assert(m.contains("runs across"), m)
      assert(m.contains("key cardinality is not driver-bounded"), m)
    } finally spark.conf.unset("spark.graft.prefixScan.maxDriverKeyRuns")
  }

  test("a null in a value column fails the task naming the column — never " +
      "a silent 0 in the fold") {
    val withNull = Seq((1L, Some(5L)), (2L, Option.empty[Long]),
      (3L, Some(7L))).toDF("k", "v")
    val e = intercept[Throwable] {
      PrefixScan.scanLong(withNull, "m", "v", "min",
        inclusive = true, asc("k")).collect()
    }
    val m = chainMessages(e)
    assert(m.contains("prefix-scan value column v"), m)
  }

  test("works on a VANILLA session (no GraftExtensions): the planner " +
      "strategy self-registers via experimental.extraStrategies") {
    val vanilla = org.apache.spark.sql.GraftSqlBridge.vanillaSession(spark)
    vanilla.conf.set("spark.sql.shuffle.partitions", "4")
    assert(!vanilla.sessionState.planner.strategies
      .exists(_.isInstanceOf[graft.plans.PrefixScanStrategy]))
    val df = vanilla.createDataFrame(Seq((1L, 10L), (2L, 20L), (3L, 30L)))
      .toDF("k", "v")
    val got = PrefixScan.scanLong(df, "cum", "v", "sum",
        inclusive = true, asc("k"))
      .select("k", "cum").collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy(_._1)
    assert(got.toSeq == Seq((1L, 10L), (2L, 30L), (3L, 60L)))
  }

  test("a nondeterministic child is rejected at build time (two-pass " +
      "replay contract)") {
    val nd = data.withColumn("r", rand(42))
    val e = intercept[IllegalArgumentException] {
      PrefixScan.scanLong(nd, "cum", "v", "sum", inclusive = true, asc("k"))
    }
    assert(e.getMessage.contains("nondeterministic"), e.getMessage)
  }
}
