package graft.sources

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import scala.jdk.CollectionConverters._

/** Minimal transactional table format — the ACID surface a user migrating
  * the reference's Delta tables expects (S7; `gps-analytics/src/pipeline/
  * tz_offset.scala:28-48` writes `saveAsTable` + `OPTIMIZE`, the append
  * pipeline `stop_locations_append.py` relies on atomic table appends),
  * rebuilt on the published log-structured design (Delta's protocol
  * paper, Armbrust et al., VLDB 2020): a table is a directory of
  * immutable parquet data files plus an append-only `_txlog/` of JSON
  * commits, each listing files ADDED and REMOVED at that version.
  *
  * Guarantees:
  *  - **Atomic commits.** Data files are staged under UUID names first;
  *    the commit publishes by `Files.move(ATOMIC_MOVE)` of the version's
  *    JSON into `_txlog/` — create-if-absent, so exactly ONE writer wins
  *    a version (optimistic concurrency; appends retry on collision,
  *    semantic writers raise). A crash before publish leaves only
  *    orphaned data files, invisible to every reader; `vacuum` reclaims
  *    them.
  *  - **Snapshot isolation + time travel.** Readers replay the log to
  *    the requested version (default: latest) and read exactly that
  *    file set — concurrent commits never tear a read.
  *  - **OPTIMIZE.** `compact` rewrites the live file set into few files
  *    in one commit (adds + removes together), leaving history intact.
  *  - **MERGE.** Copy-on-write upsert with FILE PRUNING: one semi-join
  *    over the snapshot tagged with `input_file_name()` finds the files
  *    that contain matched keys; only those are rewritten (anti-join
  *    survivors ∪ source), untouched files carry over. At 100 TB the
  *    rewrite cost is proportional to touched files, not table size —
  *    the same contract as the reference's Delta MERGE.
  *
  * Scale shape: the log is O(commits) driver-side JSON (the list-replay
  * is trivial next to any data pass; a checkpointed log is the known
  * extension); all data movement is distributed parquet IO. Atomic-move
  * publish needs a filesystem with atomic rename (POSIX, HDFS); S3-class
  * stores need a coordination service, exactly as the published design
  * notes.
  */
object TxTable {

  case class Commit(version: Long, op: String, adds: Seq[String],
      removes: Seq[String], schemaJson: String)

  private def logDir(dir: String): Path = Paths.get(dir, "_txlog")
  private def entryPath(dir: String, v: Long): Path =
    logDir(dir).resolve(f"$v%020d.json")

  /** Latest committed version, or -1 for an empty/absent log. */
  def currentVersion(dir: String): Long = {
    val ld = logDir(dir)
    if (!Files.isDirectory(ld)) -1L
    else Files.list(ld).iterator().asScala
      .map(_.getFileName.toString).filter(_.endsWith(".json"))
      .map(_.stripSuffix(".json").toLong)
      .foldLeft(-1L)(math.max)
  }

  // hand-rolled JSON (the Verify.scala convention — no extra deps);
  // fields are file names (no control chars) and a schema JSON blob
  private def esc(s: String): String = "\"" + s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  private def render(c: Commit): String =
    s"""{"version":${c.version},"op":${esc(c.op)},""" +
      s""""adds":[${c.adds.map(esc).mkString(",")}],""" +
      s""""removes":[${c.removes.map(esc).mkString(",")}],""" +
      s""""schema":${esc(c.schemaJson)}}"""

  private def parse(s: String): Commit = {
    // fields were written by `render` in fixed order — a shape-pinned
    // parse keeps the format dependency-free both ways
    def arr(key: String): Seq[String] = {
      val m = (s"""\"$key\":\\[([^\\]]*)\\]""").r.findFirstMatchIn(s)
        .getOrElse(sys.error(s"bad commit entry: $s"))
      "\"((?:[^\"\\\\]|\\\\.)*)\"".r.findAllMatchIn(m.group(1))
        .map(_.group(1).replace("\\\"", "\"").replace("\\\\", "\\")).toSeq
    }
    val v = "\"version\":(\\d+)".r.findFirstMatchIn(s).get.group(1).toLong
    val op = "\"op\":\"([^\"]*)\"".r.findFirstMatchIn(s).get.group(1)
    val schema = "\"schema\":\"((?:[^\"\\\\]|\\\\.)*)\"".r
      .findFirstMatchIn(s).map(_.group(1)
        .replace("\\\"", "\"").replace("\\\\", "\\")).getOrElse("")
    Commit(v, op, arr("adds"), arr("removes"), schema)
  }

  private def readLog(dir: String, asOf: Option[Long]): Seq[Commit] = {
    val top = asOf.getOrElse(Long.MaxValue)
    (0L to currentVersion(dir)).takeWhile(_ <= top).map { v =>
      parse(Files.readString(entryPath(dir, v)))
    }
  }

  /** Live file names at `asOf` (default latest): replay adds minus
    * removes in version order.
    */
  def activeFiles(dir: String, asOf: Option[Long] = None): Seq[String] = {
    val live = collection.mutable.LinkedHashSet.empty[String]
    readLog(dir, asOf).foreach { c =>
      c.removes.foreach(live.remove); live ++= c.adds
    }
    live.toSeq
  }

  /** Snapshot read (time travel with `asOf`). An empty snapshot still
    * carries the committed schema.
    */
  def read(spark: SparkSession, dir: String, asOf: Option[Long] = None): DataFrame = {
    val files = activeFiles(dir, asOf)
    if (files.nonEmpty)
      spark.read.parquet(files.map(f => s"$dir/$f"): _*)
    else {
      val commits = readLog(dir, asOf)
      val schema =
        if (commits.isEmpty) new StructType()
        else org.apache.spark.sql.types.DataType
          .fromJson(commits.last.schemaJson).asInstanceOf[StructType]
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    }
  }

  /** Stage `df` as parquet under UUID-prefixed names in `dir`; returns
    * the staged file names (not yet visible to any reader).
    */
  private def stage(df: DataFrame, dir: String): Seq[String] = {
    val token = java.util.UUID.randomUUID().toString.take(12)
    val tmp = Paths.get(dir, s"_staging-$token")
    df.write.mode("overwrite").parquet(tmp.toString)
    val parts = Files.list(tmp).iterator().asScala.toSeq
      .filter(_.getFileName.toString.endsWith(".parquet")).sortBy(_.toString)
    val named = parts.zipWithIndex.map { case (p, i) =>
      val name = f"$token-part$i%05d.parquet"
      Files.move(p, Paths.get(dir, name))
      name
    }
    Files.list(tmp).iterator().asScala.foreach(Files.delete) // _SUCCESS etc.
    Files.delete(tmp)
    named
  }

  /** Publish a commit. Appends (`basedOn = None`) are order-independent:
    * they claim the next free version, retrying on collision. Semantic
    * commits (overwrite/merge/compact) pass the snapshot version their
    * content was derived from — the commit must land at EXACTLY
    * basedOn + 1, else another writer changed the table under them and
    * the derived file set is stale: raise, caller re-derives.
    */
  private def publish(dir: String, op: String, adds: Seq[String],
      removes: Seq[String], schemaJson: String,
      basedOn: Option[Long]): Long = {
    Files.createDirectories(logDir(dir))
    var attempts = 0
    while (true) {
      val v = basedOn.map(_ + 1).getOrElse(currentVersion(dir) + 1)
      val tmp = logDir(dir).resolve(s".tmp-${java.util.UUID.randomUUID()}")
      Files.writeString(tmp, render(Commit(v, op, adds, removes, schemaJson)))
      val landed =
        try {
          Files.move(tmp, entryPath(dir, v), StandardCopyOption.ATOMIC_MOVE)
          true
        } catch {
          case _: java.nio.file.FileAlreadyExistsException =>
            Files.delete(tmp)
            false
        }
      if (landed) return v
      if (basedOn.isDefined)
        throw new java.util.ConcurrentModificationException(
          s"TxTable $dir: version $v committed concurrently; " +
            s"re-validate and retry the $op")
      attempts += 1
      if (attempts > 100) sys.error(s"TxTable $dir: publish starved")
    }
    -1L // unreachable
  }

  /** Raise unless the table still sits at the version the caller derived
    * its write from — the CAS guard every semantic writer runs.
    */
  private def requireVersion(dir: String, expected: Option[Long],
      base: Long, op: String): Unit =
    expected.filter(_ != base).foreach { e =>
      throw new java.util.ConcurrentModificationException(
        s"TxTable $dir: $op expected version $e but table is at $base; " +
          "re-derive and retry")
    }

  /** Atomic append (order-independent — claims the next free version). */
  def append(df: DataFrame, dir: String): Long = {
    Files.createDirectories(Paths.get(dir))
    publish(dir, "append", stage(df, dir), Nil, df.schema.json, basedOn = None)
  }

  /** Atomic full overwrite (snapshot replace). `expectedVersion` is the
    * optimistic-concurrency guard: pass the version your decision was
    * derived from and the write raises if the table moved (CAS).
    */
  def overwrite(df: DataFrame, dir: String,
      expectedVersion: Option[Long] = None): Long = {
    Files.createDirectories(Paths.get(dir))
    val base = currentVersion(dir)
    requireVersion(dir, expectedVersion, base, "overwrite")
    publish(dir, "overwrite", stage(df, dir), activeFiles(dir, Some(base)),
      df.schema.json, basedOn = Some(base))
  }

  /** OPTIMIZE: rewrite the live file set into `targetFiles` files in one
    * commit; data is unchanged, history remains time-travelable.
    */
  def compact(spark: SparkSession, dir: String, targetFiles: Int = 1,
      expectedVersion: Option[Long] = None): Long = {
    val base = currentVersion(dir)
    requireVersion(dir, expectedVersion, base, "compact")
    val before = activeFiles(dir, Some(base))
    val snap = read(spark, dir, Some(base))
    publish(dir, "compact", stage(snap.coalesce(targetFiles), dir), before,
      snap.schema.json, basedOn = Some(base))
  }

  /** MERGE (upsert): rows of `source` replace same-key rows, new keys
    * insert. Copy-on-write with file pruning — only files containing a
    * matched key are rewritten; the rest carry over untouched.
    */
  def merge(spark: SparkSession, dir: String, source: DataFrame,
      keys: Seq[String], expectedVersion: Option[Long] = None,
      opTag: Option[String] = None): Long = {
    Files.createDirectories(Paths.get(dir))
    val base = currentVersion(dir)
    val op = "merge" + opTag.map(":" + _).getOrElse("")
    requireVersion(dir, expectedVersion, base, op)
    if (base < 0) // first commit: MERGE into an empty table is an insert
      return publish(dir, op, stage(source, dir), Nil, source.schema.json,
        basedOn = Some(base))
    // bare file NAME (the log's unit), not the URI input_file_name returns
    val snap = read(spark, dir, Some(base)).withColumn("__name",
      element_at(split(input_file_name(), "/"), -1))
    val srcKeys = source.select(keys.map(col): _*).distinct()
    val touched = snap
      .join(broadcast(srcKeys), keys, "left_semi")
      .select("__name").distinct()
      .collect().map(_.getString(0)).toSeq.sorted
    val kept =
      if (touched.isEmpty) read(spark, dir).where(lit(false)) // pure insert
      else snap.where(col("__name").isin(touched: _*)).drop("__name")
        .join(srcKeys, keys, "left_anti")
    val newData = kept.unionByName(source)
    publish(dir, op, stage(newData, dir), touched,
      source.schema.json, basedOn = Some(base))
  }

  /** True if some commit carries `opTag` (idempotence lookup for sinks). */
  def hasCommitTag(dir: String, opTag: String): Boolean =
    readLog(dir, None).exists(_.op.endsWith(":" + opTag))

  /** Commit history as a DataFrame: (version, op, n_adds, n_removes). */
  def history(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    readLog(dir, None)
      .map(c => (c.version, c.op, c.adds.size.toLong, c.removes.size.toLong))
      .toDF("version", "op", "n_adds", "n_removes")
  }

  /** Reclaim data files no snapshot at or after `retainFrom` can reach:
    * orphans from crashed writers, and files removed before the horizon.
    * Time travel earlier than `retainFrom` stops working — the standard
    * retention trade.
    */
  def vacuum(dir: String, retainFrom: Long = Long.MaxValue): Long = {
    val horizon = math.min(retainFrom, currentVersion(dir))
    val reachable = (horizon to currentVersion(dir))
      .flatMap(v => activeFiles(dir, Some(v))).toSet
    val onDisk = Files.list(Paths.get(dir)).iterator().asScala
      .filter(p => p.getFileName.toString.endsWith(".parquet"))
      .toSeq
    val victims = onDisk.filterNot(p => reachable(p.getFileName.toString))
    victims.foreach(Files.delete)
    victims.size.toLong
  }
}
