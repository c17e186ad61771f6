package graft

import java.sql.Timestamp

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.{TxStats, TxTable}

/** Zone-map data skipping: stats recording, sidecar round-trip, and —
  * the property that matters — PRUNING SOUNDNESS: a skipped file must
  * contain zero rows matching the predicate, and `readWhere` must equal
  * `read().where()` exactly, for every predicate shape the walker
  * understands and several it must fail open on.
  */
class TxStatsSpec extends SparkSpec {

  private def freshDir(tag: String): String = {
    val d = s"/root/repo/target/tmp/txstats_$tag"
    def del(p: java.io.File): Unit = {
      if (p.isDirectory) p.listFiles.foreach(del)
      p.delete()
    }
    del(new java.io.File(d))
    d
  }

  private def mixedDf(rows: Seq[(Long, java.lang.Double, String, Timestamp, java.lang.Boolean)]): DataFrame = {
    val schema = StructType(Seq(
      StructField("k", LongType, nullable = false),
      StructField("v", DoubleType, nullable = true),
      StructField("s", StringType, nullable = true),
      StructField("t", TimestampType, nullable = true),
      StructField("b", BooleanType, nullable = true)))
    spark.createDataFrame(
      new java.util.ArrayList[Row](rows.map(r =>
        Row(r._1, r._2, r._3, r._4, r._5)).asJava),
      schema).repartition(1)
  }

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  /** Three files with disjoint k-ranges, nulls, NaN, and a long string. */
  private def buildTable(dir: String): Unit = {
    TxTable.append(mixedDf(Seq(
      (1L, 1.5, "apple", ts("2020-01-01 00:00:00"), java.lang.Boolean.TRUE),
      (2L, null, "banana", ts("2020-01-02 00:00:00"), java.lang.Boolean.FALSE),
      (3L, -2.0, null, null, null))), dir)
    TxTable.append(mixedDf(Seq(
      (10L, Double.NaN, "cherry", ts("2020-02-01 00:00:00"), java.lang.Boolean.TRUE),
      (11L, 7.25, "date", ts("2020-02-02 00:00:00"), java.lang.Boolean.TRUE))), dir)
    TxTable.append(mixedDf(Seq(
      (100L, 0.0, "x" * 200, ts("2021-01-01 00:00:00"), java.lang.Boolean.FALSE),
      (101L, 9.0, "zebra", ts("2021-06-01 00:00:00"), java.lang.Boolean.TRUE))), dir)
  }

  test("append records per-file zone maps with correct bounds and null counts") {
    val dir = freshDir("record")
    buildTable(dir)
    val stats = TxTable.fileStats(dir)
    assert(stats.size == 3, s"expected 3 files with stats, got ${stats.keys}")
    val byLoK = stats.values.toSeq.sortBy(_.cols("k").lo.get.asInstanceOf[Long])
    val f0 = byLoK.head
    assert(f0.rows == 3)
    assert(f0.cols("k") == TxStats.ColStats("l", 0, Some(1L), Some(3L)))
    assert(f0.cols("v").nulls == 1)
    assert(f0.cols("v").lo.contains(-2.0) && f0.cols("v").hi.contains(1.5))
    assert(f0.cols("s").nulls == 1)
    assert(f0.cols("s").lo.contains("apple") && f0.cols("s").hi.contains("banana"))
    assert(f0.cols("t").nulls == 1)
    assert(f0.cols("b") == TxStats.ColStats("l", 1, Some(0L), Some(1L)))
    // NaN handling, producer-dependent and sound either way: the scan
    // producer records NaN as the max (Spark's total order, NaN
    // greatest); the footer producer (the default) falls OPEN on a
    // NaN-containing chunk, because parquet-mr omits min/max for it —
    // unbounded can never mis-prune, and `v > 1e300` still keeps the
    // file (the battery below pins that).
    val f1 = byLoK(1)
    val v1 = f1.cols("v")
    assert(v1.hi.exists(_.asInstanceOf[Double].isNaN) ||
      (v1.lo.isEmpty && v1.hi.isEmpty), s"unsound NaN bounds: $v1")
    // a >64-char string: lower bound truncated to a sound prefix; the
    // max element ("zebra") is short, so the upper bound stays exact
    val f2 = byLoK(2)
    assert(f2.cols("s").lo.contains("x" * 64))
    assert(f2.cols("s").hi.contains("zebra"))
  }

  test("string upper bound is dropped, not loosened, under truncation") {
    val dir = freshDir("trunc")
    val s = spark
    import s.implicits._
    TxTable.append(Seq(("a" * 100, 1L), ("b" * 100, 2L))
      .toDF("s", "k").repartition(1), dir)
    val cs = TxTable.fileStats(dir).values.head.cols("s")
    assert(cs.lo.contains("a" * 64))
    assert(cs.hi.isEmpty, s"truncated max must drop the bound, got ${cs.hi}")
    // unbounded above: a > probe can never prune (fail-open)...
    assert(TxTable.pruneFiles(spark, dir, col("s") > "zzz")._2.isEmpty)
    // ...but the sound lower bound still prunes equality below it
    assert(TxTable.pruneFiles(spark, dir, col("s") === "A")._2.size == 1)
    assert(TxTable.readWhere(spark, dir, col("s") > "zzz").count() == 0)
  }

  /** Producer parity: the footer-based collector (the default write
    * path) must agree with the scan-based collect on every column the
    * footer can bound — same rows, same null counts, same lo/hi — on a
    * table that exercises nulls, NaN, -0.0, long strings, booleans and
    * timestamps. Timestamps are the one allowed divergence: INT96
    * footers carry no ordered bounds, so lo/hi may fall open (None) —
    * never a different value.
    */
  test("footer-based stats match scan-based stats (bounds exact or open)") {
    val dir = freshDir("footer")
    buildTable(dir)
    val names = TxTable.activeFiles(dir)
    val schema = StructType(Seq(
      StructField("k", LongType, nullable = false),
      StructField("v", DoubleType, nullable = true),
      StructField("s", StringType, nullable = true),
      StructField("t", TimestampType, nullable = true),
      StructField("b", BooleanType, nullable = true)))
    val scan = TxStats.collect(spark, dir, names, schema)
    val foot = TxStats.collectFromFooters(spark, dir, names, schema)
    assert(foot.keySet == scan.keySet)
    def same(a: Option[Any], b: Option[Any]): Boolean = (a, b) match {
      case (Some(x: Double), Some(y: Double)) =>
        java.lang.Double.compare(x, y) == 0 // NaN == NaN here
      case _ => a == b
    }
    names.foreach { f =>
      assert(foot(f).rows == scan(f).rows, s"$f rows")
      scan(f).cols.foreach { case (c, sc) =>
        val fc = foot(f).cols.getOrElse(c,
          fail(s"$f.$c missing from footer stats"))
        assert(fc.typ == sc.typ && fc.nulls == sc.nulls, s"$f.$c meta")
        // two allowed open-fallbacks, never a disagreement: INT96
        // timestamps carry no ordered footer bounds, and parquet-mr
        // omits min/max for a NaN-containing float/double chunk
        val mayFallOpen = c == "t" ||
          (sc.typ == "d" && sc.hi.exists(x =>
            x.asInstanceOf[Double].isNaN))
        if (mayFallOpen) {
          assert(fc.lo.isEmpty || same(fc.lo, sc.lo), s"$f.$c lo")
          assert(fc.hi.isEmpty || same(fc.hi, sc.hi), s"$f.$c hi")
        } else { // every other column: bounds must be EXACT — the footer
          // is the default producer; pruning power must not regress
          assert(same(fc.lo, sc.lo), s"$f.$c lo ${fc.lo} vs ${sc.lo}")
          assert(same(fc.hi, sc.hi), s"$f.$c hi ${fc.hi} vs ${sc.hi}")
        }
      }
    }
  }

  test("sidecar codec round-trips exactly, including tabs and newlines") {
    val stats = Map(
      "f1.parquet" -> TxStats.FileStats(2, Map(
        "a" -> TxStats.ColStats("s", 0, Some("ta\tb\nnl\\x"), None),
        "b" -> TxStats.ColStats("d", 1, Some(-0.0), Some(Double.NaN)),
        "c" -> TxStats.ColStats("l", 2, None, None))),
      "f2.parquet" -> TxStats.FileStats(0, Map.empty))
    val parsed = TxStats.parse(TxStats.render(stats))
    // -0.0 normalizes at collection; codec itself must round-trip bits
    assert(parsed("f1.parquet").cols("a") == stats("f1.parquet").cols("a"))
    assert(parsed("f1.parquet").cols("b").hi.exists(_.asInstanceOf[Double].isNaN))
    assert(parsed("f1.parquet").cols("c") == stats("f1.parquet").cols("c"))
    assert(parsed("f2.parquet") == stats("f2.parquet"))
  }

  /** The core property: for every predicate, a pruned file has zero
    * matching rows and readWhere == read().where().
    */
  test("pruning is sound and readWhere matches read().where() on a predicate battery") {
    val dir = freshDir("sound")
    buildTable(dir)
    val predicates: Seq[Column] = Seq(
      col("k") === 2L,
      col("k") === 50L, // matches nothing anywhere
      col("k") === 2, // int literal against long column (coercion)
      col("k") < 5L,
      col("k") > 11L,
      col("k") >= 100L,
      col("k") <= 1L,
      lit(5L) > col("k"), // literal-first
      col("k").between(10L, 11L),
      col("k") === 2L || col("k") === 101L,
      col("k") > 1L && col("k") < 3L,
      col("v") > 8.0,
      col("v") < -1.0,
      col("v") === 0.0,
      col("v") > 1e300, // only NaN (greatest) can exceed: file 2 must be kept
      col("v").isNull,
      col("v").isNotNull,
      col("t").isNull,
      col("s") === "cherry",
      col("s") === "aardvark",
      col("s") < "b",
      col("s").startsWith("ze"),
      col("s").startsWith("xx"), // long-string file: hi unbounded, kept
      col("s").isin("banana", "zebra"),
      col("k").isin(1L, 2L, 3L),
      col("t") >= lit(ts("2021-01-01 00:00:00")),
      col("t") < lit(ts("2020-02-01 00:00:00")),
      col("b") === true,
      col("b") === false,
      col("k") === lit(null), // null literal: nothing matches
      col("k") =!= 2L, // Not(EqualTo): prunable only on constant files
      !(col("k") > 5L), // Not(>) == <= complement
      !(col("k") <= 1L), // Not(<=) == > complement
      !(col("k") < 100L) && col("v").isNotNull, // composed complement
      col("s") =!= "zebra", // Not(EqualTo) on strings
      col("b") =!= true, // Not(EqualTo) on booleans
      !(col("t") >= lit(ts("2020-02-01 00:00:00"))), // retention shape
      col("k") + 1L > 2L, // function-of-attr: fail-open
      abs(col("v")) > 100.0, // fail-open
      col("k") < col("v"), // attr-vs-attr: fail-open
      col("k") === 2.5 // long col vs double literal (coerced space)
    )
    val snap = TxTable.read(spark, dir)
    val schema = snap.schema
    val perFile = TxTable.activeFiles(dir).map { f =>
      f -> spark.read.schema(schema).parquet(s"$dir/$f")
    }.toMap
    predicates.foreach { p =>
      val (kept, skipped) = TxTable.pruneFiles(spark, dir, p)
      assert(kept.size + skipped.size == 3, s"$p: lost a file")
      skipped.foreach { f =>
        val n = perFile(f).where(p).count()
        assert(n == 0, s"UNSOUND: $p skipped $f which has $n matching rows")
      }
      val expect = snap.where(p).collect().map(_.toString).sorted.toSeq
      val got = TxTable.readWhere(spark, dir, p).collect()
        .map(_.toString).sorted.toSeq
      assert(got == expect, s"$p: readWhere diverged")
    }
  }

  test("pruning actually skips: disjoint key ranges prune to one file") {
    val dir = freshDir("skips")
    buildTable(dir)
    val (kept, skipped) = TxTable.pruneFiles(spark, dir, col("k") >= 100L)
    assert(kept.size == 1 && skipped.size == 2,
      s"expected 1 kept / 2 skipped, got $kept / $skipped")
    // string equality below every file's range prunes everything
    val (k2, s2) = TxTable.pruneFiles(spark, dir, col("s") === "aardvark")
    assert(k2.isEmpty && s2.size == 3)
    val empty = TxTable.readWhere(spark, dir, col("s") === "aardvark")
    assert(empty.count() == 0 && empty.schema.fieldNames.contains("k"))
  }

  test("schema evolution: files predating a column are never pruned on it") {
    val dir = freshDir("evolve")
    val s = spark
    import s.implicits._
    TxTable.append(Seq((1L, "a")).toDF("k", "v").repartition(1), dir)
    TxTable.append(Seq((2L, "b", 77L)).toDF("k", "v", "extra").repartition(1), dir)
    val (kept, _) = TxTable.pruneFiles(spark, dir, col("extra") === 77L)
    assert(kept.size == 2, "old file has no 'extra' stats and must be kept")
    val got = TxTable.readWhere(spark, dir, col("extra") === 77L).collect()
    assert(got.length == 1 && got(0).getAs[Long]("extra") == 77L)
    // but a provably-impossible value still prunes the NEW file
    val (k2, s2) = TxTable.pruneFiles(spark, dir, col("extra") === 78L)
    assert(s2.size == 1, s"new file should be pruned: kept=$k2")
  }

  test("time travel prunes against the snapshot's own files and stats") {
    val dir = freshDir("asof")
    val s = spark
    import s.implicits._
    TxTable.append(Seq((1L, "old")).toDF("k", "v").repartition(1), dir)
    TxTable.overwrite(Seq((100L, "new")).toDF("k", "v").repartition(1), dir)
    val (kept0, skipped0) = TxTable.pruneFiles(spark, dir, col("k") === 1L, Some(0L))
    assert(kept0.size == 1 && skipped0.isEmpty)
    assert(TxTable.readWhere(spark, dir, col("k") === 1L, Some(0L)).count() == 1)
    val (kept1, skipped1) = TxTable.pruneFiles(spark, dir, col("k") === 1L)
    assert(kept1.isEmpty && skipped1.size == 1)
    assert(TxTable.readWhere(spark, dir, col("k") === 1L).count() == 0)
  }

  test("stats checkpoint bounds replay and keeps pruning + time travel exact") {
    val dir = freshDir("ckpt")
    val s = spark
    import s.implicits._
    // 13 appends: crosses the CheckpointEvery=10 boundary
    (0 until 13).foreach(i =>
      TxTable.append(Seq((i * 10L, s"v$i")).toDF("k", "v").repartition(1), dir))
    val ld = new java.io.File(s"$dir/_txlog")
    assert(ld.listFiles.exists(_.getName.endsWith(".stats.ckpt.tsv")),
      "expected a consolidated stats checkpoint at version 10")
    // every live file still has stats through the checkpointed path
    val stats = TxTable.fileStats(dir)
    TxTable.activeFiles(dir).foreach(f => assert(stats.contains(f)))
    // a point probe prunes to exactly one file
    val (kept, skipped) = TxTable.pruneFiles(spark, dir, col("k") === 50L)
    assert(kept.size == 1 && skipped.size == 12, s"$kept / $skipped")
    assert(TxTable.readWhere(spark, dir, col("k") === 50L).count() == 1)
    // time travel BEFORE the checkpoint uses only that snapshot's stats
    val (k2, s2) = TxTable.pruneFiles(spark, dir, col("k") === 50L, Some(7L))
    assert(k2.size == 1 && s2.size == 7)
    assert(TxTable.readWhere(spark, dir, col("k") === 120L, Some(7L)).count() == 0)
  }

  test("merge and compact refresh stats for rewritten files") {
    val dir = freshDir("rewrite")
    val s = spark
    import s.implicits._
    TxTable.append(Seq((1L, "a"), (2L, "b")).toDF("k", "v").repartition(1), dir)
    TxTable.append(Seq((10L, "c")).toDF("k", "v").repartition(1), dir)
    TxTable.merge(spark, dir, Seq((10L, "C!"), (20L, "d")).toDF("k", "v"), Seq("k"))
    val statsAfterMerge = TxTable.fileStats(dir)
    TxTable.activeFiles(dir).foreach(f =>
      assert(statsAfterMerge.contains(f), s"merged file $f lost its stats"))
    val (kept, _) = TxTable.pruneFiles(spark, dir, col("k") >= 10L)
    assert(TxTable.readWhere(spark, dir, col("k") >= 10L).count() == 2)
    assert(kept.size < TxTable.activeFiles(dir).size,
      "untouched low-key file should be pruned after merge")
    TxTable.compact(spark, dir)
    val statsAfterCompact = TxTable.fileStats(dir)
    TxTable.activeFiles(dir).foreach(f =>
      assert(statsAfterCompact.contains(f), s"compacted file $f lost its stats"))
    assert(TxTable.read(spark, dir).count() == 4)
  }

  test("timestamp columns keep ordered zone-map bounds and prune " +
      "(MICROS staging, r15)") {
    // stage() writes TIMESTAMP_MICROS, so the default footer collector
    // records ordered ts bounds — before r15, Spark's INT96 default made
    // every TimestampType column fall open and ts-range predicates never
    // pruned a file
    val dir = freshDir("tsbounds")
    TxTable.append(mixedDf(Seq(
      (1L, 1.0, "a", ts("2020-01-01 00:00:00"), java.lang.Boolean.TRUE),
      (2L, 2.0, "b", ts("2020-06-01 00:00:00"), java.lang.Boolean.TRUE))), dir)
    TxTable.append(mixedDf(Seq(
      (3L, 3.0, "c", ts("2021-01-01 00:00:00"), java.lang.Boolean.TRUE),
      (4L, 4.0, "d", ts("2021-06-01 00:00:00"), java.lang.Boolean.TRUE))), dir)
    val stats = TxTable.fileStats(dir)
    TxTable.activeFiles(dir).foreach { f =>
      val c = stats(f).cols.getOrElse("t", fail(s"$f: no ts column stats"))
      assert(c.lo.nonEmpty && c.hi.nonEmpty, s"$f: ts bounds fell open")
    }
    // a ts-range probe beyond the first file's range prunes it
    val (touched, pruned) = TxTable.pruneFiles(spark, dir,
      col("t") >= lit(ts("2021-01-01 00:00:00")))
    assert(touched.size == 1 && pruned.size == 1, s"$touched / $pruned")
    assert(TxTable.readWhere(spark, dir,
      col("t") >= lit(ts("2021-01-01 00:00:00"))).count() == 2)
  }
}
