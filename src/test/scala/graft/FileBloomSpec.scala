package graft

import org.apache.spark.sql.functions._
import graft.functions.FileBloom
import graft.sources.{TxStats, TxTable}

/** Per-file Bloom skipping: no-false-negatives (the soundness side),
  * codec round-trip, and the end-to-end property it exists for — a
  * point lookup on a high-cardinality key in a layout where zone maps
  * are useless (every file spans the full key range) still prunes.
  */
class FileBloomSpec extends SparkSpec {

  private def freshDir(tag: String): String = {
    val d = s"/root/repo/target/tmp/bloom_$tag"
    def del(p: java.io.File): Unit = {
      if (p.isDirectory) p.listFiles.foreach(del)
      p.delete()
    }
    del(new java.io.File(d))
    d
  }

  test("no false negatives ever; false positives stay near the design rate") {
    val words = new Array[Long](256) // m = 16384 bits
    val k = FileBloom.DefaultK
    val keys = (0 until 1000).map(i => s"key-$i")
    keys.foreach(FileBloom.set(words, _, k))
    keys.foreach(key =>
      assert(FileBloom.contains(words, key, k), s"false negative on $key"))
    val fp = (0 until 1000).count(i => FileBloom.contains(words, s"other-$i", k))
    assert(fp < 50, s"FPR far above design: $fp/1000") // design ~0.5%
  }

  test("bloom base64 codec and stats sidecar round-trip") {
    val words = new Array[Long](4)
    FileBloom.set(words, "abc", 3)
    FileBloom.set(words, "42", 3)
    val b = FileBloom.Bloom(3, words)
    val back = FileBloom.fromBase64(3, b.toBase64)
    assert(back.k == 3 && back.words.sameElements(words))
    val stats = Map("f.parquet" -> TxStats.FileStats(2,
      Map("k" -> TxStats.ColStats("l", 0, Some(1L), Some(2L))),
      Map("k" -> b)))
    val parsed = TxStats.parse(TxStats.render(stats))
    val pb = parsed("f.parquet").blooms("k")
    assert(pb.k == 3 && pb.words.sameElements(words))
    assert(pb.mightContain("abc") && pb.mightContain("42"))
  }

  test("point lookup prunes where zone maps cannot (interleaved layout)") {
    val dir = freshDir("point")
    val s = spark
    import s.implicits._
    // 4 appends striped by id % 4: every file spans ~the full id range,
    // so min/max pruning keeps everything — the bloom must do the work
    val ids = (0L until 4000L)
    (0 until 4).foreach { r =>
      TxTable.append(
        ids.filter(_ % 4 == r).map(i => (i, s"u$i")).toDF("id", "u")
          .repartition(1), dir, bloomFor = Seq("id", "u"))
    }
    // zone maps alone keep all 4 files for a point probe...
    val noBloomKept = {
      val stats = TxTable.fileStats(dir).map { case (f, fs) =>
        f -> fs.copy(blooms = Map.empty)
      }
      val cond = TxStats.resolve(spark, TxTable.read(spark, dir).schema,
        col("id") === 1234L)
      TxStats.prune(cond, stats, TxTable.activeFiles(dir))._1
    }
    assert(noBloomKept.size == 4, "zone maps should be useless here")
    // ...the bloom keeps only the file that can hold the key
    val (kept, skipped) = TxTable.pruneFiles(spark, dir, col("id") === 1234L)
    assert(kept.size == 1 && skipped.size == 3,
      s"bloom should prune to 1 file: kept=$kept")
    assert(TxTable.readWhere(spark, dir, col("id") === 1234L)
      .collect().map(_.getString(1)).toSeq == Seq("u1234"))
    // absent key: everything pruned, empty result, schema intact
    val (k2, _) = TxTable.pruneFiles(spark, dir, col("id") === 999999L)
    assert(k2.isEmpty)
    assert(TxTable.readWhere(spark, dir, col("id") === 999999L).count() == 0)
    // string column bloom, IN-list, and soundness vs brute force
    val (k3, _) = TxTable.pruneFiles(spark, dir, col("u") === "u77")
    assert(k3.size == 1)
    assert(TxTable.readWhere(spark, dir, col("u") === "u77").count() == 1)
    val inPred = col("id").isin(10L, 11L, 999999L)
    assert(TxTable.pruneFiles(spark, dir, inPred)._1.size == 2)
    assert(TxTable.readWhere(spark, dir, inPred).count() == 2)
    // a range predicate ignores blooms (interval logic still applies)
    assert(TxTable.readWhere(spark, dir, col("id") < 100L).count() == 100)
  }

  test("floating bloom columns are refused; unknown columns are refused") {
    val dir = freshDir("refuse")
    val s = spark
    import s.implicits._
    val df = Seq((1L, 0.5)).toDF("k", "x")
    intercept[IllegalArgumentException] {
      TxTable.append(df, dir, bloomFor = Seq("x"))
    }
    intercept[IllegalArgumentException] {
      TxTable.append(df, dir, bloomFor = Seq("nope"))
    }
  }

  test("zorder compact can carry blooms for a third, unclustered key") {
    val dir = freshDir("zorder")
    val s = spark
    import s.implicits._
    val df = (0L until 2000L).map(i => (i, i % 50, (i * 7) % 100))
      .toDF("id", "a", "b")
    TxTable.append(df.repartition(1), dir)
    TxTable.compact(spark, dir, targetFiles = 8,
      zorderBy = Seq("a", "b"), bloomFor = Seq("id"))
    val (kept, _) = TxTable.pruneFiles(spark, dir, col("id") === 777L)
    assert(kept.size <= 2, s"bloom on the unclustered id should prune: $kept")
    assert(TxTable.readWhere(spark, dir, col("id") === 777L).count() == 1)
  }
}
