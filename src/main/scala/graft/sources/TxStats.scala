package graft.sources

import java.nio.charset.StandardCharsets

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{Column, Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Per-file column statistics (zone maps) for [[TxTable]] — the
  * data-skipping layer the reference's Delta tables get from
  * `OPTIMIZE` + stats-based file pruning (the reference leans on it via
  * `spark.sql("OPTIMIZE ...")`, `gps-analytics/src/pipeline/
  * tz_offset.scala:32-70`), rebuilt on the published design (Delta's
  * protocol paper, Armbrust et al., VLDB 2020: per-AddFile min/max/
  * nullCount stats evaluated against query predicates before any data
  * is read).
  *
  * At 100 TB this is the single biggest scan lever a table format owns:
  * a predicate that touches 1% of the key space should read ~1% of the
  * files, and the decision must be made from O(files) driver-side
  * metadata, never from data IO.
  *
  * Design rules, in order:
  *  - **Advisory, fail-open.** Stats only ever REMOVE files from a
  *    scan; [[TxTable.readWhere]] always applies the full predicate to
  *    whatever survives. A file with no stats (older commit, crashed
  *    sidecar write, unsupported column type) is simply read. Wrong
  *    results are therefore impossible by construction; stats quality
  *    only moves performance.
  *  - **Sound under truncation.** String bounds are capped at
  *    [[StringPrefixCap]] chars: the stored lower bound is a prefix of
  *    the true minimum (a prefix never exceeds the string), and an
  *    upper bound that WOULD need truncation is dropped entirely rather
  *    than stored loosely — `hi = None` means "unbounded above", which
  *    can never mis-prune. This is the safe version of Delta's
  *    tightBounds handling, chosen over last-char increment games
  *    (which are unsound across UTF-8/UTF-16 order divergence at
  *    supplementary code points).
  *  - **Compare in the query's coerced space.** The predicate is
  *    analyzed against the snapshot schema first, so type coercion is
  *    Spark's own (an int column probed with a double literal becomes a
  *    double comparison). Interval tests then run in that space —
  *    long→double / long→float conversions are monotone, so widening
  *    the stored bounds through them keeps pruning sound even where the
  *    conversions are lossy.
  *  - **NaN and -0.0 follow Spark's total order** (NaN greatest,
  *    -0.0 == 0.0): stats are normalized at collection time and
  *    compared with `Double.compare`/`Float.compare`, matching the
  *    ordering Spark's min/max aggregates used to produce them.
  *
  * Stats collection reads back ONLY the indexed columns of the freshly
  * staged files (one column-pruned scan, grouped by file); a production
  * port would lift the same numbers from the parquet footers the write
  * already produced — the sidecar format and pruning logic are
  * unchanged either way.
  */
object TxStats {

  /** Stats are kept for the first N eligible columns (Delta's
    * `dataSkippingNumIndexedCols` default) — wide tables should not pay
    * an unbounded stats bill for columns nobody filters on.
    */
  val MaxIndexedCols = 32

  /** String bounds longer than this are truncated (lo) or dropped (hi). */
  val StringPrefixCap = 64

  /** One column's zone-map entry. `lo`/`hi` hold the normalized value
    * (Long for integral/date/timestamp/boolean, Double for float/double,
    * String for strings); `None` means unknown/unbounded on that side.
    */
  case class ColStats(typ: String, nulls: Long, lo: Option[Any], hi: Option[Any])

  /** One file's zone map: row count, per-column entries, and (opt-in)
    * per-column Bloom filters for point-lookup skipping.
    */
  case class FileStats(rows: Long, cols: Map[String, ColStats],
      blooms: Map[String, graft.functions.FileBloom.Bloom] = Map.empty)

  /** Normalization for an eligible type: (type tag, column rewrite that
    * makes min/max collectible as Long/Double/String). Date → epoch
    * days, timestamp → epoch micros (NOT a seconds cast, which would
    * floor the max and break soundness).
    */
  private def normType(dt: DataType): Option[(String, Column => Column)] = dt match {
    case ByteType | ShortType | IntegerType | LongType =>
      Some(("l", _.cast("long")))
    case BooleanType => Some(("l", _.cast("long")))
    case DateType => Some(("l", c => unix_date(c).cast("long")))
    case TimestampType => Some(("l", c => unix_micros(c)))
    case FloatType | DoubleType => Some(("d", _.cast("double")))
    case StringType => Some(("s", identity))
    case _ => None
  }

  private def negZero(d: Double): Double = if (d == 0.0) 0.0 else d

  /** Collect per-file stats for freshly staged files: one column-pruned
    * scan of `names` under `dir`, grouped by `input_file_name()`. Bounded
    * driver memory: one row per staged file.
    */
  def collect(spark: SparkSession, dir: String, names: Seq[String],
      schema: StructType, bloomFor: Seq[String] = Nil,
      bloomBits: Int = graft.functions.FileBloom.DefaultBits): Map[String, FileStats] = {
    if (names.isEmpty) return Map.empty
    val fields = schema.fields.iterator
      .flatMap(f => normType(f.dataType).map { case (tag, fn) => (f.name, tag, fn) })
      .take(MaxIndexedCols).toSeq
    // Bloom keys must canonicalize exactly: integral/date/timestamp
    // normalize to long, strings stay raw; float/double are refused
    // (no stable canonical form across engines/NaN)
    val bloomFields = bloomFor.map { n =>
      val f = fields.find(_._1 == n).getOrElse(throw new IllegalArgumentException(
        s"bloom column $n is not a stats-eligible column of the write schema"))
      require(f._2 != "d", s"bloom column $n has a floating type — " +
        "equality canonicalization is not stable; use an integral/string key")
      f
    }
    val numWords = math.max(1, (bloomBits + 63) / 64)
    val bloomK = graft.functions.FileBloom.DefaultK
    val df = spark.read.schema(schema).parquet(names.map(n => s"$dir/$n"): _*)
    val aggs = Seq(count(lit(1)).as("__rows")) ++ fields.zipWithIndex.flatMap {
      case ((name, tag, fn), i) =>
        val c = fn(col(name))
        val (lo, hi) =
          if (tag == "s")
            (min(substring(c, 1, StringPrefixCap + 1)),
              max(substring(c, 1, StringPrefixCap + 1)))
          else (min(c), max(c))
        Seq(lo.as(s"__lo$i"), hi.as(s"__hi$i"), count(c).as(s"__nn$i"))
    } ++ bloomFields.zipWithIndex.map { case ((name, _, fn), i) =>
      org.apache.spark.sql.GraftSqlBridge.column(
        graft.functions.BloomAgg(
          org.apache.spark.sql.GraftSqlBridge.expression(fn(col(name))),
          numWords, bloomK).toAggregateExpression()).as(s"__bf$i")
    }
    val rows = df.groupBy(input_file_name().as("__file"))
      .agg(aggs.head, aggs.tail: _*).collect()
    // key results by the caller's names (which may be partition-relative
    // paths); basenames are UUID-token-unique within a staging batch
    val byBase = names.map(n => n.split('/').last -> n).toMap
    val collected = rows.iterator.map { r =>
      val fname = byBase(r.getString(r.fieldIndex("__file")).split('/').last)
      val nRows = r.getLong(r.fieldIndex("__rows"))
      val cols = fields.zipWithIndex.map { case ((name, tag, _), i) =>
        val rawLo = Option(r.get(r.fieldIndex(s"__lo$i")))
        val rawHi = Option(r.get(r.fieldIndex(s"__hi$i")))
        val nn = r.getLong(r.fieldIndex(s"__nn$i"))
        val (lo, hi) = tag match {
          case "s" =>
            (rawLo.map(_.asInstanceOf[String].take(StringPrefixCap)),
              rawHi.map(_.asInstanceOf[String])
                .filter(_.length <= StringPrefixCap))
          case "d" =>
            (rawLo.map(v => negZero(v.asInstanceOf[Double])),
              rawHi.map(v => negZero(v.asInstanceOf[Double])))
          case _ =>
            (rawLo.map(_.asInstanceOf[Long]), rawHi.map(_.asInstanceOf[Long]))
        }
        name -> ColStats(tag, nRows - nn, lo, hi)
      }.toMap
      val blooms = bloomFields.zipWithIndex.map { case ((name, _, _), i) =>
        val bytes = r.getAs[Array[Byte]](r.fieldIndex(s"__bf$i"))
        val bb = java.nio.ByteBuffer.wrap(bytes)
        val words = new Array[Long](bytes.length / 8)
        (0 until words.length).foreach(j => words(j) = bb.getLong())
        name -> graft.functions.FileBloom.Bloom(bloomK, words)
      }.toMap
      fname -> FileStats(nRows, cols, blooms)
    }.toMap
    // an empty staged file produces no group — record rows=0 stats so
    // it is provably prunable rather than merely stats-less
    val empties = names.filterNot(collected.contains).map { n =>
      n -> FileStats(0, fields.map { case (name, tag, _) =>
        name -> ColStats(tag, 0, None, None)
      }.toMap)
    }
    collected ++ empties
  }

  /** Footer-based stats collection — the production shape the scan-based
    * [[collect]] documents: lift rows / null counts / min / max from the
    * parquet FOOTERS the staged write already produced, zero data IO and
    * zero Spark jobs (guide §6: skipping decisions must come from
    * O(files) driver-side metadata; the old read-back was a second full
    * pass over every committed byte). Sidecar format, pruning logic and
    * soundness rules are unchanged — only the producer moves.
    *
    * Parity with the scan path, case by case:
    *  - integral / date / boolean: parquet INT32/INT64/BOOLEAN footer
    *    min/max are exact under the same signed order Spark's min/max
    *    aggregates use — identical values.
    *  - float/double: parquet-mr's FLOAT/DOUBLE statistics compare with
    *    `Double.compare` (NaN greatest, -0.0 < 0.0), the same total
    *    order Spark's min/max use; `negZero` then folds -0.0 exactly as
    *    the scan path does. A chunk whose stats were dropped by the
    *    writer falls open (bounds unknown) — fail-open as ever.
    *  - strings: footer BINARY bounds are raw byte-order min/max of the
    *    column (parquet-mr drops them above its 4 KB cap — falls open);
    *    the [[StringPrefixCap]] truncate-lo / drop-hi rule applies on
    *    top, so stored bounds are exactly the scan path's.
    *  - timestamps written as INT96 (Spark's default output type) carry
    *    no ordered footer bounds: null counts are kept (order-free),
    *    min/max stay unknown — strictly less pruning than the scan
    *    path, never unsound. TIMESTAMP(MICROS/MILLIS) files get full
    *    bounds.
    *  - a column with ANY chunk lacking usable null counts is omitted
    *    from the file's entry entirely (every pruning path falls open on
    *    a missing column).
    *
    * Blooms still need the data pass — callers with `bloomFor` keep
    * using [[collect]].
    */
  def collectFromFooters(spark: SparkSession, dir: String, names: Seq[String],
      schema: StructType): Map[String, FileStats] = {
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
    import org.apache.parquet.schema.LogicalTypeAnnotation
    val conf = spark.sessionState.newHadoopConf()
    val fields = schema.fields.iterator
      .flatMap(f => normType(f.dataType).map { case (tag, _) => (f.name, tag, f.dataType) })
      .take(MaxIndexedCols).toSeq
    names.map { n =>
      val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(s"$dir/$n"), conf)
      val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try {
        val blocks = reader.getFooter.getBlocks.asScala.toSeq
        val rows = blocks.map(_.getRowCount).sum
        if (rows == 0L)
          n -> FileStats(0L, fields.map { case (name, tag, _) =>
            name -> ColStats(tag, 0L, None, None)
          }.toMap)
        else {
          val chunksByName = blocks.flatMap(_.getColumns.asScala)
            .groupBy(_.getPath.toDotString)
          val cols = fields.flatMap { case (name, tag, sparkDt) =>
            chunksByName.get(name).flatMap { chunks =>
              var nulls = 0L
              var known = true // null counts present on every chunk
              var bounded = true // ordered bounds recoverable on every chunk
              var lo: Option[Any] = None
              var hi: Option[Any] = None
              def merge(mn: Any, mx: Any): Unit = {
                def less(a: Any, b: Any): Boolean = (a, b) match {
                  case (x: Long, y: Long) => x < y
                  case (x: Double, y: Double) => java.lang.Double.compare(x, y) < 0
                  case (x: String, y: String) => utf8Cmp(x, y) < 0
                  case _ => false
                }
                lo = Some(lo.filter(v => less(v, mn)).getOrElse(mn))
                hi = Some(hi.filter(v => less(mx, v)).getOrElse(mx))
              }
              chunks.foreach { c =>
                val st = c.getStatistics
                if (st == null || !st.isNumNullsSet) known = false
                else {
                  nulls += st.getNumNulls
                  if (st.hasNonNullValue) {
                    val ptn = c.getPrimitiveType.getPrimitiveTypeName
                    val logical = c.getPrimitiveType.getLogicalTypeAnnotation
                    (tag, ptn) match {
                      case ("l", INT64) =>
                        val scale: Option[Long] = sparkDt match {
                          case TimestampType => logical match {
                            case t: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation =>
                              t.getUnit match {
                                case LogicalTypeAnnotation.TimeUnit.MICROS => Some(1L)
                                case LogicalTypeAnnotation.TimeUnit.MILLIS => Some(1000L)
                                case _ => None
                              }
                            case _ => None
                          }
                          case _ => Some(1L)
                        }
                        scale match {
                          case Some(k) => merge(
                            st.genericGetMin.asInstanceOf[java.lang.Long].longValue * k,
                            st.genericGetMax.asInstanceOf[java.lang.Long].longValue * k)
                          case None => bounded = false
                        }
                      case ("l", INT32) => merge(
                        st.genericGetMin.asInstanceOf[java.lang.Integer].longValue,
                        st.genericGetMax.asInstanceOf[java.lang.Integer].longValue)
                      case ("l", BOOLEAN) => merge(
                        if (st.genericGetMin.asInstanceOf[java.lang.Boolean]) 1L else 0L,
                        if (st.genericGetMax.asInstanceOf[java.lang.Boolean]) 1L else 0L)
                      case ("d", DOUBLE) => merge(
                        negZero(st.genericGetMin.asInstanceOf[java.lang.Double].doubleValue),
                        negZero(st.genericGetMax.asInstanceOf[java.lang.Double].doubleValue))
                      case ("d", FLOAT) => merge(
                        negZero(st.genericGetMin.asInstanceOf[java.lang.Float].doubleValue),
                        negZero(st.genericGetMax.asInstanceOf[java.lang.Float].doubleValue))
                      case ("s", BINARY) => merge(
                        st.genericGetMin.asInstanceOf[org.apache.parquet.io.api.Binary]
                          .toStringUsingUTF8,
                        st.genericGetMax.asInstanceOf[org.apache.parquet.io.api.Binary]
                          .toStringUsingUTF8)
                      case _ => bounded = false // INT96 et al: order unusable
                    }
                  } else if (st.getNumNulls < c.getValueCount) {
                    bounded = false // non-null rows exist but bounds dropped
                  }
                }
              }
              if (!known) None // no sound null count: omit column, fall open
              else {
                val (flo, fhi) =
                  if (!bounded) (None, None)
                  else tag match {
                    case "s" =>
                      (lo.map(_.asInstanceOf[String].take(StringPrefixCap)),
                        hi.map(_.asInstanceOf[String])
                          .filter(_.length <= StringPrefixCap))
                    case _ => (lo, hi)
                  }
                Some(name -> ColStats(tag, nulls, flo, fhi))
              }
            }
          }.toMap
          n -> FileStats(rows, cols)
        }
      } finally reader.close()
    }.toMap
  }

  // ---- sidecar codec (TSV, escaped; dependency-free both ways) ----

  private def esc(s: String): String = s.flatMap {
    case '\\' => "\\\\"
    case '\t' => "\\t"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case c => c.toString
  }

  private def unesc(s: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case 't' => sb += '\t'
          case 'n' => sb += '\n'
          case 'r' => sb += '\r'
          case o => sb += o
        }
        i += 2
      } else { sb += c; i += 1 }
    }
    sb.toString
  }

  private def fld(v: Option[Any]): String = v match {
    case None => "-"
    case Some(x) => "=" + esc(x.toString)
  }

  def render(stats: Map[String, FileStats]): String = {
    val sb = new StringBuilder
    stats.toSeq.sortBy(_._1).foreach { case (f, fs) =>
      sb.append("F\t").append(esc(f)).append('\t').append(fs.rows).append('\n')
      fs.cols.toSeq.sortBy(_._1).foreach { case (c, cs) =>
        sb.append("C\t").append(esc(f)).append('\t').append(esc(c)).append('\t')
          .append(cs.typ).append('\t').append(cs.nulls).append('\t')
          .append(fld(cs.lo)).append('\t').append(fld(cs.hi)).append('\n')
      }
      fs.blooms.toSeq.sortBy(_._1).foreach { case (c, b) =>
        sb.append("B\t").append(esc(f)).append('\t').append(esc(c)).append('\t')
          .append(b.k).append('\t').append(b.toBase64).append('\n')
      }
    }
    sb.toString
  }

  private def decode(typ: String, f: String): Option[Any] =
    if (f == "-") None
    else {
      val raw = unesc(f.drop(1))
      Some(typ match {
        case "l" => raw.toLong
        case "d" => raw.toDouble
        case _ => raw
      })
    }

  def parse(s: String): Map[String, FileStats] = {
    val rows = collection.mutable.Map.empty[String, Long]
    val cols = collection.mutable.Map.empty[String, List[(String, ColStats)]]
    val blooms = collection.mutable.Map
      .empty[String, List[(String, graft.functions.FileBloom.Bloom)]]
    s.linesIterator.filter(_.nonEmpty).foreach { line =>
      val p = line.split("\t", -1)
      p(0) match {
        case "F" => rows(unesc(p(1))) = p(2).toLong
        case "C" =>
          val f = unesc(p(1))
          cols(f) = (unesc(p(2)) ->
            ColStats(p(3), p(4).toLong, decode(p(3), p(5)), decode(p(3), p(6)))) ::
            cols.getOrElse(f, Nil)
        case "B" =>
          val f = unesc(p(1))
          blooms(f) = (unesc(p(2)) ->
            graft.functions.FileBloom.fromBase64(p(3).toInt, p(4))) ::
            blooms.getOrElse(f, Nil)
        case _ => // unknown record kind: ignore (forward compatibility)
      }
    }
    rows.iterator.map { case (f, n) =>
      f -> FileStats(n, cols.getOrElse(f, Nil).toMap,
        blooms.getOrElse(f, Nil).toMap)
    }.toMap
  }

  // ---- predicate → can-this-file-match (driver-side, O(pred) per file) ----

  /** Resolve a user predicate against the snapshot schema so coercion,
    * function resolution, and attribute binding are Spark's own — the
    * walk below then sees the exact tree the scan will evaluate.
    */
  def resolve(spark: SparkSession, schema: StructType, predicate: Column): Expression = {
    val empty = spark.createDataFrame(
      new java.util.ArrayList[Row](), schema)
    org.apache.spark.sql.GraftSqlBridge.analyzed(empty.where(predicate))
      .collectFirst {
        case f: org.apache.spark.sql.catalyst.plans.logical.Filter => f.condition
      }
      .getOrElse(Literal(true))
  }

  /** Unsigned UTF-8 byte comparison — the order Spark's UTF8String (and
    * parquet binary stats) use; String.compareTo (UTF-16) diverges at
    * supplementary code points.
    */
  private def utf8Cmp(a: String, b: String): Int = {
    val x = a.getBytes(StandardCharsets.UTF_8)
    val y = b.getBytes(StandardCharsets.UTF_8)
    var i = 0
    val n = math.min(x.length, y.length)
    while (i < n) {
      val c = (x(i) & 0xff) - (y(i) & 0xff)
      if (c != 0) return c
      i += 1
    }
    x.length - y.length
  }

  /** Attribute under monotone casts only: unwrapping a cast is sound for
    * interval tests iff the cast preserves order (numeric widenings are
    * monotone even where lossy; string/date/timezone casts are not
    * unwrapped).
    */
  private def attrOf(e: Expression): Option[String] = e match {
    case a: AttributeReference => Some(a.name)
    case c: Cast if monotoneCast(c.child.dataType, c.dataType) => attrOf(c.child)
    case _ => None
  }

  private def numericLike(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType | FloatType |
         DoubleType => true
    case _: DecimalType => true
    case _ => false
  }

  private def monotoneCast(from: DataType, to: DataType): Boolean =
    numericLike(from) && numericLike(to)

  /** Literal (possibly under a foldable cast, which analysis leaves
    * unfolded): evaluated driver-side to (normalized value, coerced type).
    * Normalized: Long (integral/date/timestamp/boolean), Double
    * (float/double), String, BigDecimal. None = not a literal or an
    * unsupported/unevaluable type.
    */
  private def litOf(e: Expression): Option[(Any, DataType)] = e match {
    case Literal(v, dt) => Some((normLit(v, dt), dt))
    case c: Cast if c.child.isInstanceOf[Literal] =>
      try Some((normLit(c.eval(null), c.dataType), c.dataType))
      catch { case _: Exception => None }
    case _ => None
  }

  private def normLit(v: Any, dt: DataType): Any =
    if (v == null) null
    else dt match {
      case ByteType => v.asInstanceOf[Byte].toLong
      case ShortType => v.asInstanceOf[Short].toLong
      case IntegerType | DateType => v.asInstanceOf[Int].toLong
      case LongType | TimestampType => v.asInstanceOf[Long]
      case BooleanType => if (v.asInstanceOf[Boolean]) 1L else 0L
      case FloatType => negZero(v.asInstanceOf[Float].toDouble)
      case DoubleType => negZero(v.asInstanceOf[Double])
      case StringType => v.toString
      case _: DecimalType => v.asInstanceOf[org.apache.spark.sql.types.Decimal].toBigDecimal
      case _ => v
    }

  private def statToDouble(v: Any): Option[Double] = v match {
    case l: Long => Some(l.toDouble) // monotone — sound for interval tests
    case d: Double => Some(d)
    case _ => None
  }

  private def statToBigDec(v: Any): Option[BigDecimal] = v match {
    case l: Long => Some(BigDecimal(l))
    case d: Double =>
      if (d.isNaN || d.isInfinite) None
      else Some(BigDecimal(new java.math.BigDecimal(d))) // exact binary expansion
    case _ => None
  }

  /** Compare a stored bound against a literal in the literal's coerced
    * space. None = incomparable (never prune on it).
    */
  private def cmp(statVal: Any, litVal: Any, litDt: DataType): Option[Int] = litDt match {
    case FloatType =>
      statToDouble(statVal).map(s =>
        java.lang.Float.compare(s.toFloat, litVal.asInstanceOf[Double].toFloat))
    case DoubleType =>
      statToDouble(statVal).map(s =>
        java.lang.Double.compare(s, litVal.asInstanceOf[Double]))
    case _: DecimalType =>
      statToBigDec(statVal).map(_.compare(litVal.asInstanceOf[BigDecimal]))
    case ByteType | ShortType | IntegerType | LongType | DateType |
         TimestampType | BooleanType =>
      statVal match {
        case s: Long => Some(java.lang.Long.compare(s, litVal.asInstanceOf[Long]))
        case _ => None
      }
    case StringType =>
      statVal match {
        case s: String => Some(utf8Cmp(s, litVal.asInstanceOf[String]))
        case _ => None
      }
    case _ => None
  }

  /** Interval tests. Each returns "the file MAY contain a matching row";
    * unknown bounds and incomparable values fall open (true).
    */
  private def hasNonNull(fs: FileStats, cs: ColStats): Boolean = cs.nulls < fs.rows

  /** Bloom probe: false ONLY when the filter proves the key absent.
    * Keys canonicalize exactly as [[collect]] inserted them (normalized
    * long's decimal form, raw string); anything else falls open.
    */
  private def bloomMayContain(fs: FileStats, name: String, v: Any,
      dt: DataType): Boolean =
    fs.blooms.get(name) match {
      case None => true
      case Some(b) => dt match {
        case ByteType | ShortType | IntegerType | LongType | DateType |
             TimestampType | BooleanType => v match {
          case l: Long => b.mightContain(l.toString)
          case _ => true
        }
        case StringType => v match {
          case s: String => b.mightContain(s)
          case _ => true
        }
        case _ => true
      }
    }

  private def mayEq(fs: FileStats, cs: ColStats, v: Any, dt: DataType): Boolean =
    hasNonNull(fs, cs) &&
      cs.lo.forall(l => cmp(l, v, dt).forall(_ <= 0)) &&
      cs.hi.forall(h => cmp(h, v, dt).forall(_ >= 0))

  private def mayLt(fs: FileStats, cs: ColStats, v: Any, dt: DataType): Boolean =
    hasNonNull(fs, cs) && cs.lo.forall(l => cmp(l, v, dt).forall(_ < 0))

  private def mayLe(fs: FileStats, cs: ColStats, v: Any, dt: DataType): Boolean =
    hasNonNull(fs, cs) && cs.lo.forall(l => cmp(l, v, dt).forall(_ <= 0))

  private def mayGt(fs: FileStats, cs: ColStats, v: Any, dt: DataType): Boolean =
    hasNonNull(fs, cs) && cs.hi.forall(h => cmp(h, v, dt).forall(_ > 0))

  private def mayGe(fs: FileStats, cs: ColStats, v: Any, dt: DataType): Boolean =
    hasNonNull(fs, cs) && cs.hi.forall(h => cmp(h, v, dt).forall(_ >= 0))

  /** One binary comparison, either operand order: apply `fwd` when the
    * attribute is on the left, `rev` when on the right; a null literal
    * makes the comparison NULL (no row passes a null filter).
    */
  private def binCmp(fs: FileStats, l: Expression, r: Expression)(
      fwd: (String, ColStats, Any, DataType) => Boolean,
      rev: (String, ColStats, Any, DataType) => Boolean): Boolean = {
    val sides = Seq(
      (attrOf(l), litOf(r), true),
      (attrOf(r), litOf(l), false))
    sides.collectFirst { case (Some(name), Some((v, dt)), isFwd) =>
      if (v == null) false
      else fs.cols.get(name) match {
        case Some(cs) => if (isFwd) fwd(name, cs, v, dt) else rev(name, cs, v, dt)
        case None => true // no stats for this column: cannot prune
      }
    }.getOrElse(true) // attr-vs-attr, function-of-attr, etc.: cannot prune
  }

  /** Can a file with stats `fs` contain a row matching `e`? Sound,
    * conservative: anything unrecognized is "maybe" (true).
    */
  def canMatch(e: Expression, fs: FileStats): Boolean = e match {
    case And(l, r) => canMatch(l, fs) && canMatch(r, fs)
    case Or(l, r) => canMatch(l, fs) || canMatch(r, fs)
    case Not(child) => child match {
      case IsNull(a) => canMatch(IsNotNull(a), fs)
      case IsNotNull(a) => canMatch(IsNull(a), fs)
      // comparison complements (a row MATCHES Not(cmp) only when cmp is
      // FALSE, never NULL — so null rows are excluded, like any filter):
      // NOT(a > v) ⇔ a <= v, etc.; NOT(a = v) can only be ruled out when
      // the file is constant at v (lo == hi == v). These are what make a
      // whole-partition or retention-range DELETE provably total on a
      // file — the zero-read drop path.
      case GreaterThan(l, r) => canMatch(LessThanOrEqual(l, r), fs)
      case GreaterThanOrEqual(l, r) => canMatch(LessThan(l, r), fs)
      case LessThan(l, r) => canMatch(GreaterThanOrEqual(l, r), fs)
      case LessThanOrEqual(l, r) => canMatch(GreaterThan(l, r), fs)
      case EqualTo(l, r) =>
        // a string lo of exactly StringPrefixCap chars may be a TRUNCATED
        // longer minimum — it cannot prove the file constant at v
        def exactLo(x: Any): Boolean = x match {
          case s: String => s.length < StringPrefixCap
          case _ => true
        }
        def neq(n: String, cs: ColStats, v: Any, dt: DataType): Boolean =
          hasNonNull(fs, cs) && !(
            cs.lo.exists(x => exactLo(x) && cmp(x, v, dt).contains(0)) &&
            cs.hi.exists(x => cmp(x, v, dt).contains(0)))
        binCmp(fs, l, r)(neq, neq)
      case Not(inner) => canMatch(inner, fs) // ¬¬e
      case _ => true
    }
    case Literal(b: Boolean, BooleanType) => b
    case Literal(null, _) => false // WHERE NULL keeps nothing
    case IsNull(a) => attrOf(a).flatMap(fs.cols.get) match {
      case Some(cs) => cs.nulls > 0
      case None => true
    }
    case IsNotNull(a) => attrOf(a).flatMap(fs.cols.get) match {
      case Some(cs) => hasNonNull(fs, cs)
      case None => true
    }
    case EqualTo(l, r) =>
      def eq(n: String, cs: ColStats, v: Any, dt: DataType): Boolean =
        mayEq(fs, cs, v, dt) && bloomMayContain(fs, n, v, dt)
      binCmp(fs, l, r)(eq, eq)
    case EqualNullSafe(l, r) =>
      (litOf(l), litOf(r)) match {
        case (Some((null, _)), _) => attrOf(r).flatMap(fs.cols.get)
          .forall(_.nulls > 0)
        case (_, Some((null, _))) => attrOf(l).flatMap(fs.cols.get)
          .forall(_.nulls > 0)
        case _ =>
          def eq(n: String, cs: ColStats, v: Any, dt: DataType): Boolean =
            mayEq(fs, cs, v, dt) && bloomMayContain(fs, n, v, dt)
          binCmp(fs, l, r)(eq, eq)
      }
    case LessThan(l, r) => // attr < v | v < attr
      binCmp(fs, l, r)((_, cs, v, dt) => mayLt(fs, cs, v, dt),
        (_, cs, v, dt) => mayGt(fs, cs, v, dt))
    case LessThanOrEqual(l, r) =>
      binCmp(fs, l, r)((_, cs, v, dt) => mayLe(fs, cs, v, dt),
        (_, cs, v, dt) => mayGe(fs, cs, v, dt))
    case GreaterThan(l, r) => // attr > v | v > attr
      binCmp(fs, l, r)((_, cs, v, dt) => mayGt(fs, cs, v, dt),
        (_, cs, v, dt) => mayLt(fs, cs, v, dt))
    case GreaterThanOrEqual(l, r) =>
      binCmp(fs, l, r)((_, cs, v, dt) => mayGe(fs, cs, v, dt),
        (_, cs, v, dt) => mayLe(fs, cs, v, dt))
    case In(a, vs) if vs.forall(v => litOf(v).isDefined) =>
      attrOf(a) match {
        case None => true
        case Some(name) => fs.cols.get(name) match {
          case None => true
          case Some(cs) =>
            // null list entries contribute NULL (never TRUE) to IN
            vs.flatMap(litOf).exists { case (v, dt) =>
              v != null && mayEq(fs, cs, v, dt) &&
                bloomMayContain(fs, name, v, dt)
            }
        }
      }
    case StartsWith(l, r) =>
      (attrOf(l), litOf(r)) match {
        case (Some(name), Some((p: String, StringType))) =>
          fs.cols.get(name) match {
            case None => true
            case Some(cs) =>
              // any x with prefix p satisfies x >= p; and if lo > p with
              // lo not itself prefixed by p, every x >= lo exceeds all
              // p-prefixed strings (comparison decided inside p)
              hasNonNull(fs, cs) &&
                cs.hi.forall {
                  case h: String => utf8Cmp(h, p) >= 0
                  case _ => true
                } &&
                cs.lo.forall {
                  case lo: String => utf8Cmp(lo, p) <= 0 || lo.startsWith(p)
                  case _ => true
                }
          }
        case (_, Some((null, _))) => false
        case _ => true
      }
    case _ => true // unknown shape: never prune on it
  }

  /** Partition `files` into (kept, skipped) under `cond` (a RESOLVED
    * predicate from [[resolve]]). Files without stats are always kept.
    */
  def prune(cond: Expression, stats: Map[String, FileStats],
      files: Seq[String]): (Seq[String], Seq[String]) =
    files.partition(f => stats.get(f).forall(canMatch(cond, _)))

  /** Sound "EVERY row of this file satisfies `e` — TRUE, never null" test,
    * the dual of [[canMatch]]: DELETE's zero-read drop removes a file from
    * the log without reading it when the predicate provably holds on all
    * its rows (a whole dropped partition's lo == hi value, a retention
    * range entirely past the cutoff). Null semantics are the filter's: a
    * row where `e` is NULL does NOT satisfy it, so any possible null
    * operand fails the test. Conservative: anything unrecognized is false
    * (the caller falls back to the copy-on-write rewrite).
    *
    * Truncated string bounds stay sound: a stored `lo` is a PREFIX of the
    * true minimum, so `lo > v` / `lo >= v` still bound the true values
    * from below; equality additionally needs `lo` exact (length under the
    * cap), and `hi` is only ever stored exact.
    */
  def mustMatchAll(e: Expression, fs: FileStats): Boolean = {
    def exactLo(x: Any): Boolean = x match {
      case s: String => s.length < StringPrefixCap
      case _ => true
    }
    def bin(l: Expression, r: Expression)(
        fwd: (ColStats, Any, DataType) => Boolean,
        rev: (ColStats, Any, DataType) => Boolean): Boolean =
      Seq((attrOf(l), litOf(r), true), (attrOf(r), litOf(l), false))
        .collectFirst { case (Some(name), Some((v, dt)), isFwd) =>
          v != null && fs.cols.get(name).exists(cs =>
            cs.nulls == 0 &&
              (if (isFwd) fwd(cs, v, dt) else rev(cs, v, dt)))
        }.getOrElse(false)
    e match {
      case And(l, r) => mustMatchAll(l, fs) && mustMatchAll(r, fs)
      case Or(l, r) => mustMatchAll(l, fs) || mustMatchAll(r, fs)
      case Literal(b: Boolean, BooleanType) => b
      case IsNull(a) =>
        attrOf(a).flatMap(fs.cols.get).exists(_.nulls == fs.rows)
      case IsNotNull(a) =>
        attrOf(a).flatMap(fs.cols.get).exists(_.nulls == 0)
      case EqualTo(l, r) =>
        def allEq(cs: ColStats, v: Any, dt: DataType): Boolean =
          cs.lo.exists(x => exactLo(x) && cmp(x, v, dt).contains(0)) &&
            cs.hi.exists(x => cmp(x, v, dt).contains(0))
        bin(l, r)(allEq, allEq)
      case LessThan(l, r) => // all(a < v) | all(v < a)
        bin(l, r)(
          (cs, v, dt) => cs.hi.exists(x => cmp(x, v, dt).exists(_ < 0)),
          (cs, v, dt) => cs.lo.exists(x => cmp(x, v, dt).exists(_ > 0)))
      case LessThanOrEqual(l, r) =>
        bin(l, r)(
          (cs, v, dt) => cs.hi.exists(x => cmp(x, v, dt).exists(_ <= 0)),
          (cs, v, dt) => cs.lo.exists(x => cmp(x, v, dt).exists(_ >= 0)))
      case GreaterThan(l, r) =>
        bin(l, r)(
          (cs, v, dt) => cs.lo.exists(x => cmp(x, v, dt).exists(_ > 0)),
          (cs, v, dt) => cs.hi.exists(x => cmp(x, v, dt).exists(_ < 0)))
      case GreaterThanOrEqual(l, r) =>
        bin(l, r)(
          (cs, v, dt) => cs.lo.exists(x => cmp(x, v, dt).exists(_ >= 0)),
          (cs, v, dt) => cs.hi.exists(x => cmp(x, v, dt).exists(_ <= 0)))
      case In(a, vs) if vs.forall(v => litOf(v).isDefined) =>
        // all rows equal ONE constant that the list contains
        attrOf(a).flatMap(fs.cols.get).exists { cs =>
          cs.nulls == 0 && cs.lo.exists(exactLo) &&
            vs.flatMap(litOf).exists { case (v, dt) =>
              v != null &&
                cs.lo.exists(x => cmp(x, v, dt).contains(0)) &&
                cs.hi.exists(x => cmp(x, v, dt).contains(0))
            }
        }
      case _ => false // unknown shape: never drop on it
    }
  }
}
