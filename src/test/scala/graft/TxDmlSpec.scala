package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.sources.TxTable

/** Copy-on-write DELETE / UPDATE: row semantics (incl. NULL predicates),
  * zone-map file pruning on the write path, no-op short-circuit,
  * type preservation, CAS guards, and the CDF view of both.
  */
class TxDmlSpec extends SparkSpec {

  private def freshDir(tag: String): String = {
    val d = s"/root/repo/target/tmp/txdml_$tag"
    def del(p: java.io.File): Unit = {
      if (p.isDirectory) p.listFiles.foreach(del)
      p.delete()
    }
    del(new java.io.File(d))
    d
  }

  private def kv(dir: String): Set[(Long, String)] =
    TxTable.read(spark, dir).collect()
      .map(r => (r.getAs[Long]("k"), r.getAs[String]("v"))).toSet

  test("delete removes exactly the matching rows; NULL predicate keeps the row") {
    val dir = freshDir("rows")
    val s = spark
    import s.implicits._
    TxTable.append(Seq((1L, "a"), (2L, "b"), (3L, null: String), (4L, "d"))
      .toDF("k", "v").repartition(1), dir)
    // v = 'b' is NULL for the null row -> that row is NOT deleted
    TxTable.delete(spark, dir, col("v") === "b")
    assert(kv(dir) == Set(1L -> "a", 3L -> null, 4L -> "d"))
    // time travel still sees the pre-delete snapshot
    assert(TxTable.read(spark, dir, Some(0L)).count() == 4)
    // delete everything: empty table, schema intact
    TxTable.delete(spark, dir, lit(true))
    assert(TxTable.read(spark, dir).count() == 0)
    assert(TxTable.read(spark, dir).columns.toSeq == Seq("k", "v"))
  }

  test("delete is file-pruned: only files that may match are rewritten") {
    val dir = freshDir("pruned")
    val s = spark
    import s.implicits._
    // three disjoint key-range files
    Seq(0L until 10L, 10L until 20L, 20L until 30L).foreach { r =>
      TxTable.append(r.map(i => (i, s"v$i")).toDF("k", "v").repartition(1), dir)
    }
    val before = TxTable.activeFiles(dir).toSet
    TxTable.delete(spark, dir, col("k") === 15L)
    val removed = TxTable.history(spark, dir)
      .where(col("op") === "delete").collect()(0).getAs[Long]("n_removes")
    assert(removed == 1L, s"delete should rewrite exactly 1 file, removed $removed")
    assert(TxTable.activeFiles(dir).toSet.intersect(before).size == 2,
      "the two unaffected files must carry over byte-identical")
    assert(TxTable.read(spark, dir).count() == 29)
    // provably-no-match delete is a NO-OP: no new version
    val v = TxTable.currentVersion(dir)
    assert(TxTable.delete(spark, dir, col("k") === 999L) == v)
    assert(TxTable.currentVersion(dir) == v)
  }

  test("update edits matching rows in place, preserves types, prunes files") {
    val dir = freshDir("update")
    val s = spark
    import s.implicits._
    Seq(0L until 10L, 10L until 20L).foreach { r =>
      TxTable.append(r.map(i => (i, i * 100L)).toDF("k", "cents")
        .repartition(1), dir)
    }
    TxTable.update(spark, dir, col("k") >= 15L,
      Map("cents" -> (col("cents") + 7L)))
    val got = TxTable.read(spark, dir).collect()
      .map(r => (r.getAs[Long]("k"), r.getAs[Long]("cents"))).toMap
    (0L until 20L).foreach { i =>
      val want = if (i >= 15L) i * 100L + 7L else i * 100L
      assert(got(i) == want, s"k=$i: ${got(i)} != $want")
    }
    val removed = TxTable.history(spark, dir)
      .where(col("op") === "update").collect()(0).getAs[Long]("n_removes")
    assert(removed == 1L, s"update should rewrite only the high file: $removed")
    // unknown column and no-match short-circuit
    intercept[IllegalArgumentException] {
      TxTable.update(spark, dir, lit(true), Map("nope" -> lit(1L)))
    }
    val v = TxTable.currentVersion(dir)
    assert(TxTable.update(spark, dir, col("k") === 999L,
      Map("cents" -> lit(0L))) == v)
  }

  test("CDF shows delete rows and update pre/post images") {
    val dir = freshDir("cdf")
    val s = spark
    import s.implicits._
    TxTable.append(Seq((1L, 10L), (2L, 20L), (3L, 30L))
      .toDF("k", "cents").repartition(1), dir)
    TxTable.delete(spark, dir, col("k") === 2L) // v1
    TxTable.update(spark, dir, col("k") === 3L,
      Map("cents" -> lit(99L))) // v2
    val ch = TxTable.readChanges(spark, dir, 0L).collect()
      .map(r => (r.getAs[Long]("_commit_version"),
        r.getAs[String]("_change_type"), r.getAs[Long]("k"),
        r.getAs[Long]("cents"))).toSet
    assert(ch == Set(
      (1L, "delete", 2L, 20L),
      (2L, "delete", 3L, 30L), (2L, "insert", 3L, 99L)))
  }

  test("CAS: delete/update raise when the table moved under them") {
    val dir = freshDir("cas")
    val s = spark
    import s.implicits._
    TxTable.append(Seq((1L, "a")).toDF("k", "v").repartition(1), dir)
    intercept[java.util.ConcurrentModificationException] {
      TxTable.delete(spark, dir, lit(true), expectedVersion = Some(5L))
    }
    intercept[java.util.ConcurrentModificationException] {
      TxTable.update(spark, dir, lit(true), Map("v" -> lit("x")),
        expectedVersion = Some(5L))
    }
  }
}
