package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** Readers/writers covering the reference's source/sink surface (SURVEY §2.1).
  *
  * The reference reads Parquet (`wbgps/analysis.py:136-141`), ORC
  * (`build_random_sets.py:31`), JSON (`build_2020_sets.py:27`), CSV with
  * header/multiLine/FAILFAST (`geocode_stop_locations.scala:26`) and Hive
  * tables via SQL (`stop_locations.py:63-70`); it writes Parquet
  * (overwrite/append, `stop_locations.py:98`), date-partitioned tables
  * (`tz_offset.scala:28-32`) and single-file CSVs
  * (`compute_share_top_tweets_containing_ngram.py:107-108`).
  *
  * All readers return a lazy DataFrame so Catalyst can push filters and prune
  * columns into the scan — callers should `.select`/`.where` immediately and
  * check `PushedFilters` in `.explain("formatted")`.
  */
object GraftIO {

  // ---- scans (S1-S5) ----
  def parquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  def orc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  def json(spark: SparkSession, path: String, schema: Option[StructType] = None): DataFrame = {
    val r = spark.read
    schema.fold(r)(r.schema).json(path)
  }

  /** CSV with the reference's option set: header, optional multiLine, FAILFAST. */
  def csv(
      spark: SparkSession,
      path: String,
      schema: Option[StructType] = None,
      multiLine: Boolean = false,
      failFast: Boolean = true): DataFrame = {
    val base = spark.read
      .option("header", "true")
      .option("multiLine", multiLine.toString)
      .option("mode", if (failFast) "FAILFAST" else "PERMISSIVE")
    schema.fold(base.option("inferSchema", "true"))(base.schema).csv(path)
  }

  /** XML scan (built into spark-sql since Spark 4; one row per `rowTag`
    * element). Schema inference reads the files once — pass a schema in
    * production.
    */
  def xml(spark: SparkSession, path: String, rowTag: String = "row"): DataFrame =
    spark.read.option("rowTag", rowTag).format("xml").load(path)

  /** Whole-file binary scan (multimodal ingest: images/audio/video land as
    * one (path, modificationTime, length, content) row per file). The
    * content column is the opaque `binary` the Multimodal operators expect;
    * at 100 TB pair it with `pathGlobFilter`/`recursiveFileLookup` and a
    * max file size guard — one file = one row = one task's memory.
    */
  def binaryFiles(spark: SparkSession, path: String, glob: String = "*"): DataFrame =
    spark.read.format("binaryFile").option("pathGlobFilter", glob).load(path)

  /** Metastore-style scan: register the parquet as a temp view, query by SQL
    * (reference pattern `spark.sql("SELECT ... FROM tab WHERE ...")`).
    */
  def sqlOver(spark: SparkSession, path: String, view: String, sql: String): DataFrame = {
    spark.read.parquet(path).createOrReplaceTempView(view)
    spark.sql(sql)
  }

  // ---- sinks (S6-S8) ----
  def writeParquet(df: DataFrame, path: String, mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).parquet(path)

  /** Date/column-partitioned parquet sink (stands in for the reference's
    * Delta `partitionBy("date")` table, `tz_offset.scala:28-32`). At 100 TB
    * this is the layout that gives downstream partition pruning.
    */
  def writePartitioned(df: DataFrame, path: String, cols: Seq[String],
      mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).partitionBy(cols: _*).parquet(path)

  /** Dynamic partition overwrite — what the reference's incremental append
    * DAG actually needs from its Delta table (`tz_offset.scala:28-48`):
    * only the partitions present in `df` are replaced; all others survive
    * untouched. Plain overwrite mode would drop the whole table root.
    */
  def overwritePartitionsDynamic(df: DataFrame, path: String, cols: Seq[String]): Unit =
    df.write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(cols: _*).parquet(path)

  /** Bucketed table sink (`bucketBy` + `saveAsTable` — bucket metadata
    * lives in the session catalog). Pre-shuffles ONCE on the bucket key so
    * every later equi-join or aggregation on that key between same-bucketed
    * tables is exchange-free — at 100 TB this converts the nightly big-big
    * join from a full shuffle of both sides into a local zipped scan.
    */
  def writeBucketed(
      df: DataFrame, table: String, bucketCol: String, nBuckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(nBuckets, bucketCol).sortBy(bucketCol)
      .format("parquet").saveAsTable(table)

  /** Single-file CSV with header (`coalesce(1)` — small outputs only). */
  def writeSingleCsv(df: DataFrame, path: String): Unit =
    df.coalesce(1).write.mode(SaveMode.Overwrite).option("header", "true").csv(path)

  def writeOrc(df: DataFrame, path: String, mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).orc(path)

  def writeJson(df: DataFrame, path: String, mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).json(path)

  def writeXml(df: DataFrame, path: String, rowTag: String = "row",
      mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).option("rowTag", rowTag).format("xml").save(path)

  /** Compaction pass ≈ the reference's Delta OPTIMIZE (`tz_offset.scala:32-48`):
    * rewrite a directory into `n` files.
    */
  def compact(spark: SparkSession, path: String, n: Int): Unit = {
    val tmp = path.stripSuffix("/") + "__compact_tmp"
    spark.read.parquet(path).repartition(n).write.mode(SaveMode.Overwrite).parquet(tmp)
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    val dst = new org.apache.hadoop.fs.Path(path)
    fs.delete(dst, true)
    fs.rename(new org.apache.hadoop.fs.Path(tmp), dst)
  }
}
