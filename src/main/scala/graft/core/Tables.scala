package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided parquet tables (TESTDATA.md).
  *
  * One parquet file per table under `/root/testdata/sf{...}/`. All engine
  * queries take the sf directory as a parameter so the same code runs at any
  * scale factor (and, on a cluster, against a directory of many files).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Schema memo per parquet path — METADATA only, never data. Each
    * `spark.read.parquet(path)` infers the schema by listing the path
    * and reading a footer on the DRIVER; a bench/verify run constructs
    * hundreds of single-table frames over the same ten files, so the
    * repeated inference is pure single-threaded driver overhead (guide
    * §5/§7.3). The memo hands `DataFrameReader.schema` the known
    * StructType, which skips inference entirely; execution still reads
    * every row from parquet. Keyed by path string: testdata fixtures
    * are immutable for the life of a process (the driver contract).
    */
  private val schemaCache =
    new java.util.concurrent.ConcurrentHashMap[String, org.apache.spark.sql.types.StructType]()

  /** Timestamp normalization across driver testdata generations: the
    * events table has shipped as TIMESTAMP(NANOS) (read as long under
    * `spark.sql.legacy.parquet.nanosAsLong=true`) and, in later rounds,
    * as TIMESTAMP(MICROS) without isAdjustedToUTC (read as
    * TIMESTAMP_NTZ). Queries are written against a plain UTC
    * `TimestampType`, so rebuild one here either way — sessions pin the
    * UTC session timezone, so the NTZ→TZ cast is the identity on the
    * wall-clock value.
    */
  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val path = s"$dir/$name.parquet"
    // Memo key carries the file's (mtime, size): a fixture regenerated
    // in-place within one JVM (test/regen flows) gets a fresh inference
    // instead of a stale schema silently miscasting columns. One stat
    // call per frame construction — still zero footer reads when warm.
    val f = new java.io.File(path)
    val key = s"$path@${f.lastModified}:${f.length}"
    val schema = schemaCache.computeIfAbsent(key,
      _ => spark.read.parquet(path).schema)
    val df = spark.read.schema(schema).parquet(path)
    val withTs =
      if (df.schema.exists(f => f.name == "ts" && f.dataType == LongType))
        df.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
      else df
    // NOTE: matches TOP-LEVEL NTZ fields only; an NTZ timestamp nested in
    // a struct/array/map would pass through unconverted. No current
    // testdata table has one — recurse into nested types if that changes.
    withTs.schema.collect {
      case f if f.dataType == TimestampNTZType => f.name
    }.foldLeft(withTs)((d, c) => d.withColumn(c, col(c).cast(TimestampType)))
  }

  def region(s: SparkSession, d: String): DataFrame = apply(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = apply(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = apply(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = apply(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = apply(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame = apply(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}
