package graft.sources

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{And, Expression, Literal}
import org.apache.spark.sql.execution.datasources.{FileIndex, PartitionDirectory}
import org.apache.spark.sql.types.StructType

/** Catalyst-integrated file listing for a [[TxTable]] snapshot — the seam
  * that turns the table's zone-map / Bloom sidecars into CONNECTOR-level
  * data skipping (the architecture Delta's `TahoeFileIndex` uses on the
  * same published design, Armbrust et al., VLDB 2020; the reference's
  * pipelines read Delta tables through exactly this path,
  * `gps-analytics/src/pipeline/tz_offset.scala:32-70`).
  *
  * Spark's `FileSourceStrategy` hands `listFiles` the query's data filters
  * AT PLANNING TIME; evaluating them against [[TxTable.fileStats]] here
  * means a plain `spark.read.format("graft").load(dir).where(p)` — or the
  * same query in pure SQL over a `USING graft` table — scans only the
  * files that can match, with the vectorized parquet reader, whole-stage
  * codegen, and parquet row-group pushdown all intact (they come free from
  * `HadoopFsRelation` + `ParquetFileFormat`). Fail-open like every stats
  * path: files without stats are kept, and Spark re-applies the full
  * predicate to every surviving row.
  *
  * The snapshot (file list + stats + schema) is pinned at construction —
  * the connector's read is the same immutable-snapshot read as
  * [[TxTable.read]]; concurrent commits never tear it.
  */
final class GraftFileIndex(spark: SparkSession, dir: String,
    asOf: Option[Long]) extends FileIndex {

  private val names: Seq[String] = TxTable.activeFiles(dir, asOf)
  private val stats: Map[String, TxStats.FileStats] =
    TxTable.fileStats(dir, asOf)
  private val statuses: Map[String, FileStatus] = names.map { n =>
    val f = new java.io.File(dir, n)
    n -> new FileStatus(f.length, false, 1, 128L * 1024 * 1024,
      f.lastModified, new Path(f.toURI))
  }.toMap

  /** (kept, skipped) of the most recent `listFiles` — observability seam
    * for specs and benchmarks (the driver-side twin of the scan's
    * `numFiles` metric).
    */
  @volatile var lastPrune: Option[(Int, Int)] = None

  override def rootPaths: Seq[Path] =
    Seq(new Path(new java.io.File(dir).toURI))

  override def partitionSchema: StructType = new StructType()

  override def listFiles(partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    val cond = dataFilters.reduceOption(And).getOrElse(Literal(true))
    val (kept, skipped) = TxStats.prune(cond, stats, names)
    lastPrune = Some((kept.size, skipped.size))
    Seq(PartitionDirectory(InternalRow.empty,
      kept.map(statuses(_)).toArray))
  }

  override def inputFiles: Array[String] =
    names.map(n => new java.io.File(dir, n).getPath).toArray

  override def refresh(): Unit = ()

  override def sizeInBytes: Long = statuses.values.map(_.getLen).sum
}
