package graft

import java.nio.file.Files
import graft.sources.GraftIO

/** File-layout ops: the compaction pass (≈ the reference's Delta OPTIMIZE,
  * `tz_offset.scala:32-48`) preserves content while changing file count.
  */
class IOSpec extends SparkSpec {

  test("compact rewrites a many-file directory into n files, same rows") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_compact").toString + "/t"
    val df = (1 to 1000).map(i => (i.toLong, s"row$i")).toDF("id", "s")
    df.repartition(8).write.parquet(dir)
    val before = new java.io.File(dir).listFiles().count(_.getName.endsWith(".parquet"))
    assert(before == 8)

    GraftIO.compact(spark, dir, 2)
    val after = new java.io.File(dir).listFiles().count(_.getName.endsWith(".parquet"))
    assert(after == 2)
    val back = GraftIO.parquet(spark, dir)
    assert(back.count() == 1000)
    assert(back.as[(Long, String)].collect().toSet ==
      (1 to 1000).map(i => (i.toLong, s"row$i")).toSet)
  }

  test("saveAsTable + spark.table round-trip (metastore-style S5 surface)") {
    import spark.implicits._
    Seq((1L, "x"), (2L, "y")).toDF("id", "v")
      .write.mode("overwrite").saveAsTable("graft_t1")
    val back = spark.table("graft_t1")
    assert(back.count() == 2)
    assert(spark.sql("SELECT v FROM graft_t1 WHERE id = 2").collect().head.getString(0) == "y")
    spark.sql("DROP TABLE graft_t1")
  }

  test("partition filter prunes partitions at the scan (no full-table read)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_prune").toString + "/t"
    GraftIO.writePartitioned(
      (1 to 100).map(i => (i.toLong, s"p${i % 10}")).toDF("id", "k"), dir, Seq("k"))
    val df = GraftIO.parquet(spark, dir).where($"k" === "p3")
    val plan = df.queryExecution.executedPlan.toString
    // the partition predicate must reach the scan's PartitionFilters (file
    // listing prunes 9/10 directories) — NOT appear as a post-scan Filter.
    // (df.inputFiles can't verify this: it lists the unpruned relation.)
    assert("""PartitionFilters: \[[^\]]*\(k""".r.findFirstIn(plan).isDefined, plan)
    val scannedParts = df.queryExecution.executedPlan.collectLeaves().collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.selectedPartitions.partitionCount
    }
    assert(scannedParts.contains(1), s"scanned $scannedParts partitions, want 1")
    assert(df.count() == 10)
  }

  test("dynamic partition overwrite replaces only touched partitions") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_dynpart").toString + "/t"
    GraftIO.writePartitioned(
      Seq((1L, "a"), (2L, "b"), (3L, "a")).toDF("id", "k"), dir, Seq("k"))
    // overwrite ONLY partition a with new content; b must survive
    GraftIO.overwritePartitionsDynamic(
      Seq((10L, "a")).toDF("id", "k"), dir, Seq("k"))
    val back = GraftIO.parquet(spark, dir).as[(Long, String)].collect().toSet
    assert(back == Set((10L, "a"), (2L, "b")), back.toString)
    // static overwrite of the same write would have dropped k=b entirely
  }

  test("bucketed tables equi-join with no shuffle exchange") {
    import spark.implicits._
    val a = (1 to 1000).map(i => (i.toLong, i * 2.0)).toDF("k", "va")
    val b = (1 to 1000).map(i => (i.toLong, s"s$i")).toDF("k", "vb")
    GraftIO.writeBucketed(a, "graft_bucket_a", "k", 4)
    GraftIO.writeBucketed(b, "graft_bucket_b", "k", 4)
    val thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      val j = spark.table("graft_bucket_a").join(spark.table("graft_bucket_b"), "k")
      assert(j.count() == 1000)
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)
      spark.sql("DROP TABLE graft_bucket_a")
      spark.sql("DROP TABLE graft_bucket_b")
    }
  }

  test("window over a bucketed table needs no exchange either") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val df = (1 to 1000).map(i => (i.toLong % 50, i.toLong)).toDF("k", "v")
    GraftIO.writeBucketed(df, "graft_bucket_w", "k", 4)
    try {
      val w = Window.partitionBy("k").orderBy("v")
      val ranked = spark.table("graft_bucket_w")
        .withColumn("rn", row_number().over(w))
      assert(ranked.count() == 1000)
      val plan = ranked.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"window over bucketed table still shuffles:\n$plan")
    } finally spark.sql("DROP TABLE graft_bucket_w")
  }

  test("partitioned sink lays out one directory per key") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_part").toString + "/t"
    val df = Seq((1L, "a"), (2L, "b"), (3L, "a")).toDF("id", "k")
    GraftIO.writePartitioned(df, dir, Seq("k"))
    val parts = new java.io.File(dir).listFiles().map(_.getName).filter(_.startsWith("k=")).sorted
    assert(parts.toSeq == Seq("k=a", "k=b"))
    // pruned read: only one partition's rows
    val a = GraftIO.parquet(spark, dir).where(org.apache.spark.sql.functions.col("k") === "a")
    assert(a.count() == 2)
  }
}
