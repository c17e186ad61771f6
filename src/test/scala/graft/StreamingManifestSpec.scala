package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.StreamingManifest
import graft.streaming.StreamingManifest.In

/** The streaming manifest must equal the batch bit_xor recompute over the
  * same rows — for any micro-batch split and any arrival order (xor is
  * commutative and self-inverse).
  */
class StreamingManifestSpec extends SparkSpec {

  private def docs(n: Int): Seq[(Long, String, String)] =
    (0 until n).map(i => (i.toLong, s"src${i % 3}", s"document body $i"))

  private def leaves(rows: Seq[(Long, String, String)]): Seq[In] = {
    import spark.implicits._
    rows.toDF("doc_id", "source", "text")
      .select(col("source"),
        StreamingManifest.leafCol(col("doc_id"), col("text")).as("leaf"))
      .as[In].collect().toSeq
  }

  private def runStream(input: Seq[Seq[In]], name: String): Map[String, (Long, Long)] = {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    // transformWithState needs multi-column-family state
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val ms = MemoryStream[In]
    val q = StreamingManifest.digests(ms.toDS()).writeStream
      .format("memory").queryName(name).outputMode("update").start()
    input.foreach { batch => ms.addData(batch); q.processAllAvailable() }
    q.stop()
    // last emitted digest per source wins (Update mode)
    spark.table(name).collect()
      .groupBy(_.getString(0))
      .map { case (s, rs) => s -> { val r = rs.last; (r.getLong(1), r.getLong(2)) } }
  }

  test("any micro-batch split and arrival order equals the batch recompute") {
    import spark.implicits._
    val all = leaves(docs(60))
    val batch = all.toDS().groupBy("source")
      .agg(count(lit(1)).as("n"), expr("bit_xor(leaf)").as("x"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val s1 = runStream(all.grouped(7).toSeq, "mani_a")
    val s2 = runStream(all.reverse.grouped(13).toSeq, "mani_b")
    assert(s1 == batch, s"split-7 stream != batch: $s1 vs $batch")
    assert(s2 == batch, s"reversed split-13 stream != batch")
  }

  test("a retraction is the same fold: xor the leaf back out") {
    val all = leaves(docs(9))
    val dropped = all.head
    val retracted = runStream(Seq(all, Seq(dropped)), "mani_c")
    val without = runStream(Seq(all.tail), "mani_d")
    // re-xoring the dropped leaf restores the without-it digest (count
    // differs by design — the digest is the content check)
    assert(retracted(dropped.source)._2 == without(dropped.source)._2)
  }
}
