package graft

import java.sql.Date

import org.apache.spark.sql.{DataFrame, Row, SaveMode}
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.TxTable

/** Hive-partitioned TxTables: layout on disk, value re-attachment (typed,
  * including null partitions), static partition pruning AND synthesized
  * zone-map pruning through both the library (`readWhere`/`pruneFiles`)
  * and connector (`format("graft")`, numFiles metric) read paths, layout
  * rules (append can't change it, overwrite can), the not-yet-supported
  * refusals, and recursive vacuum.
  */
class PartitionedTxSpec extends SparkSpec {

  private def freshDir(tag: String): String = {
    val d = s"/root/repo/target/tmp/parttx_$tag"
    def del(p: java.io.File): Unit = {
      if (p.isDirectory) p.listFiles.foreach(del)
      p.delete()
    }
    del(new java.io.File(d))
    d
  }

  /** (k, region, day, v): region string (one null), day date, k long. */
  private def sample(): DataFrame = {
    import scala.jdk.CollectionConverters._
    val schema = StructType(Seq(
      StructField("k", LongType, nullable = false),
      StructField("region", StringType, nullable = true),
      StructField("day", DateType, nullable = false),
      StructField("v", DoubleType, nullable = false)))
    val rows = (0L until 60L).map { i =>
      val region = if (i % 20 == 19) null else s"r${i % 3}"
      Row(i, region, Date.valueOf(s"2021-01-0${i % 2 + 1}"), i * 1.5)
    }
    spark.createDataFrame(new java.util.ArrayList[Row](rows.asJava), schema)
      .repartition(2)
  }

  private def fileScans(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[FileSourceScanExec] = p match {
    case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
      fileScans(a.executedPlan)
    case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
      fileScans(q.plan)
    case s: FileSourceScanExec => Seq(s)
    case other => other.children.flatMap(fileScans)
  }

  private def scannedFiles(df: DataFrame): Long = {
    df.collect()
    fileScans(df.queryExecution.executedPlan)
      .map(_.metrics("numFiles").value).sum
  }

  test("roundtrip: partition values re-attached, typed, null partition kept") {
    val dir = freshDir("roundtrip")
    val df = sample()
    TxTable.append(df, dir, partitionBy = Seq("region", "day"))
    val back = TxTable.read(spark, dir)
    assert(back.schema.fieldNames.toSeq == Seq("k", "region", "day", "v"))
    assert(back.schema("region").dataType == StringType)
    assert(back.schema("day").dataType == DateType)
    val expect = df.orderBy("k").collect().toSeq
    assert(back.orderBy("k").collect().toSeq == expect)
    // hive layout on disk
    val dirs = new java.io.File(dir).listFiles.filter(_.isDirectory)
      .map(_.getName).filterNot(_.startsWith("_")).sorted.toSeq
    assert(dirs.contains("region=r0") &&
      dirs.contains("region=__HIVE_DEFAULT_PARTITION__"), dirs)
  }

  test("partition pruning through the connector, exact results") {
    val dir = freshDir("prune")
    sample().write.format("graft").partitionBy("region")
      .mode(SaveMode.Append).save(dir)
    val all = spark.read.format("graft").load(dir)
    val totalFiles = scannedFiles(all.select(count(lit(1))))
    assert(totalFiles >= 4) // 3 regions + null partition, >=1 file each
    // static partition pruning: one region's files only
    val one = spark.read.format("graft").load(dir)
      .where(col("region") === "r1")
    val oneFiles = scannedFiles(one)
    assert(oneFiles < totalFiles && oneFiles >= 1, s"$oneFiles/$totalFiles")
    assert(one.count() == sample().where(col("region") === "r1").count())
    // IS NULL reaches exactly the hive null partition
    val nulls = spark.read.format("graft").load(dir)
      .where(col("region").isNull)
    assert(scannedFiles(nulls) < totalFiles)
    assert(nulls.count() == 3)
    // mixed partition+data predicate prunes on BOTH (synthesized stats
    // carry the partition value; recorded stats carry k)
    val mixed = spark.read.format("graft").load(dir)
      .where(col("region") === "r1" && col("k") < 0L)
    assert(mixed.count() == 0)
  }

  test("library path: readWhere equals read().where, pruneFiles sound") {
    val dir = freshDir("lib")
    TxTable.append(sample(), dir, partitionBy = Seq("day"))
    val pred = col("day") === Date.valueOf("2021-01-01") && col("k") >= 10L
    val viaWhere = TxTable.readWhere(spark, dir, pred)
      .orderBy("k").collect().toSeq
    val plain = TxTable.read(spark, dir).where(pred)
      .orderBy("k").collect().toSeq
    assert(viaWhere == plain && plain.nonEmpty)
    // the observability seam sees the synthesized partition stats
    val (kept, skipped) =
      TxTable.pruneFiles(spark, dir, col("day") === Date.valueOf("2021-01-02"))
    assert(skipped.nonEmpty)
    assert(kept.forall(_.startsWith("day=2021-01-02/")), kept)
  }

  test("append inherits layout and refuses a different one; overwrite re-partitions") {
    val dir = freshDir("layout")
    TxTable.append(sample(), dir, partitionBy = Seq("region"))
    // bare append inherits
    TxTable.append(sample().withColumn("k", col("k") + 100L), dir)
    assert(TxTable.partitionColsAt(dir) == Seq("region"))
    assert(TxTable.read(spark, dir).count() == 120)
    intercept[IllegalArgumentException] {
      TxTable.append(sample(), dir, partitionBy = Seq("day"))
    }
    // overwrite may change the layout; time travel still reads the old one
    TxTable.overwrite(sample(), dir, partitionBy = Seq("day"))
    assert(TxTable.partitionColsAt(dir) == Seq("day"))
    assert(TxTable.read(spark, dir).count() == 60)
    assert(TxTable.partitionColsAt(dir, Some(1L)) == Seq("region"))
    assert(TxTable.read(spark, dir, Some(1L)).count() == 120)
  }

  test("unsupported ops refuse loudly on partitioned tables") {
    val dir = freshDir("refuse")
    TxTable.append(sample(), dir, partitionBy = Seq("region"))
    intercept[IllegalArgumentException] {
      TxTable.delete(spark, dir, col("k") === 1L)
    }
    intercept[IllegalArgumentException] {
      TxTable.update(spark, dir, col("k") === 1L, Map("v" -> lit(0.0)))
    }
    intercept[IllegalArgumentException] {
      TxTable.merge(spark, dir, sample(), Seq("k"))
    }
    intercept[IllegalArgumentException] {
      TxTable.compact(spark, dir)
    }
    intercept[IllegalArgumentException] {
      TxTable.readChanges(spark, dir, -1L)
    }
    // float partition keys are refused outright
    intercept[IllegalArgumentException] {
      TxTable.append(sample(), freshDir("floatpart"), partitionBy = Seq("v"))
    }
  }

  test("vacuum reclaims nested files dropped by overwrite") {
    val dir = freshDir("vacuum")
    TxTable.append(sample(), dir, partitionBy = Seq("region"))
    val before = TxTable.activeFiles(dir).size
    TxTable.overwrite(sample().where(col("k") < 10L), dir,
      partitionBy = Seq("region"))
    val reclaimed = TxTable.vacuum(dir) // retain latest only
    assert(reclaimed == before, s"reclaimed $reclaimed of $before")
    // the survivor snapshot is intact
    assert(TxTable.read(spark, dir).count() == 10)
  }

  test("schema evolution on a partitioned table") {
    val dir = freshDir("evolve")
    TxTable.append(sample(), dir, partitionBy = Seq("region"))
    TxTable.append(
      sample().withColumn("k", col("k") + 100L)
        .withColumn("extra", lit(7L)), dir)
    val back = TxTable.read(spark, dir)
    assert(back.schema.fieldNames.toSeq ==
      Seq("k", "region", "day", "v", "extra"))
    assert(back.where(col("extra").isNull).count() == 60) // old files
    assert(back.where(col("extra") === 7L).count() == 60)
  }
}
