package graft

import org.apache.spark.sql.functions._
import graft.functions.ZOrder
import graft.sources.TxTable

/** Z-order clustering: bucket/interleave bit-level correctness, data
  * preservation through a zorder compact, and the layout property the
  * operator exists for — zone-map pruning works on EVERY zorder column,
  * where a single-key sort serves one dimension and a plain compact
  * serves none.
  */
class ZOrderSpec extends SparkSpec {

  private def freshDir(tag: String): String = {
    val d = s"/root/repo/target/tmp/zorder_$tag"
    def del(p: java.io.File): Unit = {
      if (p.isDirectory) p.listFiles.foreach(del)
      p.delete()
    }
    del(new java.io.File(d))
    d
  }

  test("bucketOf: binary-search bucket ids with NaN ranked greatest") {
    val bounds = Array(10.0, 20.0, 30.0)
    assert(ZOrder.bucketOf(5.0, bounds) == 0L)
    assert(ZOrder.bucketOf(10.0, bounds) == 1L) // boundary counts below
    assert(ZOrder.bucketOf(15.0, bounds) == 1L)
    assert(ZOrder.bucketOf(30.0, bounds) == 3L)
    assert(ZOrder.bucketOf(99.0, bounds) == 3L)
    assert(ZOrder.bucketOf(Double.NaN, bounds) == 3L)
    assert(ZOrder.bucketOf(1.0, Array.empty[Double]) == 0L)
  }

  test("interleave matches a reference Morton implementation") {
    def morton(bs: Seq[Long]): Long = {
      val n = bs.size
      (for { i <- 0 until ZOrder.BitsPerCol; j <- 0 until n }
        yield ((bs(j) >> i) & 1L) << (i * n + j)).sum
    }
    val s = spark
    import s.implicits._
    val cases = Seq((0L, 0L), (255L, 0L), (0L, 255L), (255L, 255L),
      (1L, 2L), (170L, 85L), (37L, 201L))
    val got = cases.toDF("a", "b")
      .select(ZOrder.interleave(Seq(col("a"), col("b"))).as("z"))
      .collect().map(_.getLong(0)).toSeq
    assert(got == cases.map(c => morton(Seq(c._1, c._2))))
    // three columns
    val got3 = Seq((3L, 5L, 7L)).toDF("a", "b", "c")
      .select(ZOrder.interleave(Seq(col("a"), col("b"), col("c"))).as("z"))
      .collect()(0).getLong(0)
    assert(got3 == morton(Seq(3L, 5L, 7L)))
  }

  test("zvalue orders jointly: quantile buckets spread a skewed column") {
    val s = spark
    import s.implicits._
    // heavily skewed x (90% zeros) — equi-depth buckets must still
    // split the non-zero tail instead of collapsing it into one bucket
    val df = (0 until 1000).map(i => (if (i < 900) 0L else (i - 899L) * 10L,
      i.toLong % 7)).toDF("x", "y")
    val z = df.withColumn("z", ZOrder.zvalue(df, Seq("x", "y")))
    val distinctZ = z.select("z").distinct().count()
    assert(distinctZ > 50, s"z-values collapsed: $distinctZ distinct")
  }

  test("utf8 prefix ordinal preserves UTF-8 byte order") {
    import org.apache.spark.unsafe.types.UTF8String
    val words = Seq("", "a", "aa", "ab", "b", "ba", "zz", "zzzzzzzzzz",
      "é", "中文", "z￿")
    val sorted = words.sortWith((a, b) =>
      UTF8String.fromString(a).compareTo(UTF8String.fromString(b)) < 0)
    val ords = sorted.map(w =>
      graft.functions.Utf8PrefixOrdinal.ordinal(UTF8String.fromString(w)))
    ords.sliding(2).foreach { case Seq(x, y) =>
      assert(x <= y, s"ordinal order broken: $x > $y")
    }
    assert(ords.forall(_ >= 0L))
  }

  test("zorder clusters string columns: domain probe prunes files") {
    val dir = freshDir("strings")
    val s = spark
    import s.implicits._
    val domains = Seq("alpha.com", "beta.org", "gamma.net", "delta.io",
      "epsilon.co", "zeta.dev", "eta.ai", "theta.edu")
    val rows = (0 until 4000).map(i =>
      (domains(i % 8), i.toLong, (i * 2654435761L) % 10007L))
      .sortBy(_._3).map(r => (r._1, r._2))
    TxTable.append(rows.toDF("domain", "id").repartition(1), dir)
    TxTable.compact(spark, dir, targetFiles = 16, zorderBy = Seq("domain", "id"))
    val p = col("domain") === "gamma.net"
    val (kept, skipped) = TxTable.pruneFiles(spark, dir, p)
    assert(skipped.size >= 8, s"string zorder should prune: skipped $skipped")
    assert(TxTable.readWhere(spark, dir, p).count() == 500)
    val sw = col("domain").startsWith("zet")
    assert(TxTable.pruneFiles(spark, dir, sw)._2.size >= 8)
    assert(TxTable.readWhere(spark, dir, sw).count() == 500)
  }

  test("zorder compact preserves data exactly and commits as one version") {
    val dir = freshDir("preserve")
    val s = spark
    import s.implicits._
    val df = (0 until 500).map(i => (i.toLong, (i * 37 % 500).toLong,
      s"r$i")).toDF("a", "b", "v")
    TxTable.append(df.repartition(1), dir)
    TxTable.compact(spark, dir, targetFiles = 8, zorderBy = Seq("a", "b"))
    assert(TxTable.activeFiles(dir).size == 8)
    val got = TxTable.read(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(got == df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet)
    val ops = TxTable.history(spark, dir).collect().map(_.getString(1)).toSeq
    assert(ops == Seq("append", "zorder"))
  }

  test("zorder layout prunes on BOTH dimensions; single sort only on one") {
    val s = spark
    import s.implicits._
    // 100x100 grid of independent keys, deterministically shuffled so
    // the ingest order correlates with neither dimension
    val rows = (for { a <- 0 until 100; b <- 0 until 100 }
      yield (a.toLong, b.toLong, (a * 2654435761L + b * 40503L) % 10007L))
      .sortBy(_._3).map(r => (r._1, r._2))
    val df = rows.toDF("a", "b")
    val nFiles = 16

    def build(tag: String)(arrange: String => Unit): String = {
      val dir = freshDir(tag)
      TxTable.append(df.repartition(1), dir)
      arrange(dir)
      assert(TxTable.activeFiles(dir).size == nFiles)
      dir
    }
    val zDir = build("zboth")(d =>
      TxTable.compact(spark, d, targetFiles = nFiles, zorderBy = Seq("a", "b")))
    val aDir = build("asort") { d =>
      // single-key sort layout: zorder on one column IS a quantile sort
      TxTable.compact(spark, d, targetFiles = nFiles, zorderBy = Seq("a"))
    }

    def skipped(dir: String, p: org.apache.spark.sql.Column): Int =
      TxTable.pruneFiles(spark, dir, p)._2.size

    val bandA = col("a").between(40L, 45L)
    val bandB = col("b").between(40L, 45L)
    val zA = skipped(zDir, bandA)
    val zB = skipped(zDir, bandB)
    val aA = skipped(aDir, bandA)
    val aB = skipped(aDir, bandB)
    // single sort: near-perfect on its key, useless on the other
    assert(aA >= 12, s"sorted-by-a should prune hard on a: skipped $aA/16")
    assert(aB == 0, s"sorted-by-a cannot prune on b: skipped $aB/16")
    // zorder: substantial pruning on BOTH (range-boundary sampling can
    // split a Morton cell across two files, so the per-dimension
    // projection is between 1/4 and 1/2 of the range — well above the
    // sorted layout's zero on its blind dimension either way)
    assert(zA >= 6, s"zorder should prune on a: skipped $zA/16")
    assert(zB >= 6, s"zorder should prune on b: skipped $zB/16")
    // and correctness is untouched by layout
    val expect = df.where(bandA).count()
    assert(TxTable.readWhere(spark, zDir, bandA).count() == expect)
    assert(TxTable.readWhere(spark, aDir, bandA).count() == expect)
  }
}
