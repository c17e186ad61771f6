package graft.sources

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference,
  BoundReference, Expression, Literal, Predicate}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.execution.datasources.{FileIndex,
  HadoopFsRelation, PartitionDirectory}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types._

/** Catalyst-integrated file listing for a [[TxTable]] snapshot — the seam
  * that turns the table's zone-map / Bloom sidecars into CONNECTOR-level
  * data skipping (the architecture Delta's `TahoeFileIndex` uses on the
  * same published design, Armbrust et al., VLDB 2020; the reference's
  * pipelines read Delta tables through exactly this path,
  * `gps-analytics/src/pipeline/tz_offset.scala:32-70`).
  *
  * Spark's `FileSourceStrategy` hands `listFiles` the query's partition
  * and data filters AT PLANNING TIME:
  *
  *  - **partition filters** are evaluated against each hive directory's
  *    typed values (recovered from the `col=value/` path segments the
  *    table's own writer produced) — classic static partition pruning;
  *  - **data filters** are evaluated against [[TxTable.fileStats]]
  *    per file — and since a partitioned snapshot's stats are synthesized
  *    with `lo == hi` for partition columns, mixed predicates prune
  *    through the same sound walker.
  *
  * Either way a plain `spark.read.format("graft").load(dir).where(p)` —
  * or the same query in pure SQL over a `USING graft` table — scans only
  * the files that can match, with the vectorized parquet reader,
  * whole-stage codegen, and parquet row-group pushdown all intact (they
  * come free from `HadoopFsRelation` + `ParquetFileFormat`; partition
  * values are re-attached by the scan from each `PartitionDirectory`).
  * Fail-open like every stats path: files without stats are kept, and
  * Spark re-applies the full predicate to every surviving row.
  *
  * The snapshot (file list + stats + schema + layout) is pinned at
  * construction — the connector's read is the same immutable-snapshot
  * read as [[TxTable.read]]; concurrent commits never tear it.
  */
final class GraftFileIndex(spark: SparkSession, dir: String,
    asOf: Option[Long]) extends FileIndex {

  private val names: Seq[String] = TxTable.activeFiles(dir, asOf)
  private val stats: Map[String, TxStats.FileStats] =
    TxTable.fileStats(dir, asOf)
  private val pcols: Seq[String] = TxTable.partitionColsAt(dir, asOf)
  private val partFields: Seq[StructField] = {
    val schema = TxTable.schemaAt(dir, asOf).getOrElse(new StructType())
    pcols.map(c => schema(c))
  }
  private val statuses: Map[String, FileStatus] = names.map { n =>
    val f = new java.io.File(dir, n)
    n -> new FileStatus(f.length, false, 1, 128L * 1024 * 1024,
      f.lastModified, new Path(f.toURI))
  }.toMap

  /** One hive directory's typed partition values, in scan (internal)
    * form: UTF8String / int days / numerics / null.
    */
  private def internalValues(rel: String): InternalRow =
    if (pcols.isEmpty) InternalRow.empty
    else new GenericInternalRow(
      TxTable.partRaw(rel, pcols).zip(partFields).map {
        case (None, _) => null
        case (Some(r), f) => f.dataType match {
          case StringType => org.apache.spark.unsafe.types.UTF8String.fromString(r)
          case ByteType => r.toByte
          case ShortType => r.toShort
          case IntegerType => r.toInt
          case LongType => r.toLong
          case BooleanType => r.toBoolean
          case DateType => java.time.LocalDate.parse(r).toEpochDay.toInt
          case other => sys.error(s"unsupported partition type $other")
        }
      }.toArray[Any])

  /** Files grouped by partition directory (one group, empty values, for an
    * unpartitioned table).
    */
  private val groups: Seq[(InternalRow, Seq[String])] =
    if (pcols.isEmpty) Seq((InternalRow.empty, names))
    else names.groupBy(n => n.substring(0, n.lastIndexOf('/') + 1)).toSeq
      .sortBy(_._1)
      .map { case (rel, fs) => (internalValues(fs.head), fs) }

  /** (kept, skipped) of the most recent `listFiles` — observability seam
    * for specs and benchmarks (the driver-side twin of the scan's
    * `numFiles` metric).
    */
  @volatile var lastPrune: Option[(Int, Int)] = None

  override def rootPaths: Seq[Path] =
    Seq(new Path(new java.io.File(dir).toURI))

  override def partitionSchema: StructType = StructType(partFields)

  override def listFiles(partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    val keptGroups =
      if (pcols.isEmpty || partitionFilters.isEmpty) groups
      else {
        // the PartitioningAwareFileIndex discipline: bind by name into the
        // partition schema, evaluate per directory
        val bound = Predicate.createInterpreted(
          partitionFilters.reduce(And).transform {
            case a: AttributeReference =>
              val i = partFields.indexWhere(_.name == a.name)
              BoundReference(i, partFields(i).dataType, nullable = true)
          })
        bound.initialize(0)
        groups.filter { case (values, _) => bound.eval(values) }
      }
    val cond = dataFilters.reduceOption(And).getOrElse(Literal(true))
    val dirs = keptGroups.map { case (values, fs) =>
      val (kept, _) = TxStats.prune(cond, stats, fs)
      PartitionDirectory(values, kept.map(statuses(_)).toArray)
    }
    val keptN = dirs.map(_.files.size).sum
    lastPrune = Some((keptN, names.size - keptN))
    dirs.filter(_.files.nonEmpty)
  }

  override def inputFiles: Array[String] =
    names.map(n => new java.io.File(dir, n).getPath).toArray

  override def refresh(): Unit = ()

  override def sizeInBytes: Long = statuses.values.map(_.getLen).sum
}

object GraftFileIndex {

  /** Read-side nullability: files written before a column evolved into
    * the schema read it as null, so the scan schema must be nullable
    * whatever the writes declared — the same `asNullable` normalization
    * `spark.read.schema(...)` applies, re-stated here because this
    * relation is constructed directly.
    */
  private def nullable(dt: DataType): DataType = dt match {
    case s: StructType => StructType(s.fields.map(f =>
      f.copy(dataType = nullable(f.dataType), nullable = true)))
    case a: ArrayType =>
      a.copy(elementType = nullable(a.elementType), containsNull = true)
    case m: MapType =>
      m.copy(valueType = nullable(m.valueType), valueContainsNull = true)
    case other => other
  }

  /** The snapshot as a `HadoopFsRelation`: data schema from the committed
    * schema minus partition columns (data files do not store them), the
    * partition schema carried by the file index.
    */
  def relation(spark: SparkSession, dir: String,
      asOf: Option[Long]): HadoopFsRelation = {
    val schema = TxTable.schemaAt(dir, asOf).getOrElse(
      throw new IllegalArgumentException(s"no TxTable at $dir"))
    val pcols = TxTable.partitionColsAt(dir, asOf)
    val dataSchema = nullable(StructType(
      schema.filterNot(f => pcols.contains(f.name)))).asInstanceOf[StructType]
    val index = new GraftFileIndex(spark, dir, asOf)
    HadoopFsRelation(index, index.partitionSchema, dataSchema, None,
      new ParquetFileFormat(), Map.empty)(spark)
  }

  /** The snapshot as a DataFrame (partition columns re-attached by the
    * scan; column order is data-then-partition, Spark's file-source
    * convention — [[TxTable.read]] projects back to committed order).
    */
  def frame(spark: SparkSession, dir: String, asOf: Option[Long]): DataFrame =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .baseRelationToDataFrame(relation(spark, dir, asOf))
}
