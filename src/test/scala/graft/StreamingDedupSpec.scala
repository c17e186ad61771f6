package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.streaming.StreamingDedup
import graft.streaming.StreamingDedup.{BandRow, Candidate}

/** Streaming near-dup detection vs the batch LSH path: the map-side band
  * keys must match `Dedup.bandKeysRows` exactly, and the keyed-state
  * detector must flag exactly the docs the batch candidate-pair join
  * would, when docs arrive in id order across micro-batches.
  */
case class StreamDoc(doc_id: Long, text: String)

class StreamingDedupSpec extends SparkSpec {
  

  private def mkDocs: Seq[StreamDoc] = {
    // 5 base texts x 4 variants: v0/v1 identical (guaranteed all-band
    // collision), v2 one word changed (near-dup), v3 word-rotated
    // (distinct shingles). Ids interleave groups so id order != group
    // order.
    val words = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon"
    (0 until 5).flatMap { g =>
      val base = words.split(" ").map(w => s"$w$g").toSeq
      Seq(
        StreamDoc(g.toLong, base.mkString(" ")),
        StreamDoc((5 + g).toLong, base.mkString(" ")),
        StreamDoc((10 + g).toLong, (base.dropRight(1) :+ "changed").mkString(" ")),
        StreamDoc((15 + g).toLong, (base.drop(7) ++ base.take(7)).mkString(" ")))
    }
  }

  test("map-side band keys equal the batch aggregate path") {
    import spark.implicits._
    val docs = mkDocs.toDF("doc_id", "text")
    val streamSide = StreamingDedup.bandRows(docs)
      .select(col("docId").as("doc"), col("band"), col("key"))
      .collect().toSet
    val batchSide = Dedup
      .bandKeysRows(docs, "doc_id", "text", Dedup.MinHashParams())
      .collect().toSet
    assert(streamSide == batchSide)
  }

  test("id-ordered arrival flags exactly the batch candidate verdicts") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val docs = mkDocs
    val batchPairs = Dedup
      .lshCandidatePairs(docs.toDF("doc_id", "text"), "doc_id", "text")
      .as[(Long, Long)].collect().toSet

    val input = MemoryStream[StreamDoc]
    val bands = StreamingDedup
      .bandRows(input.toDF().toDF("doc_id", "text")).as[BandRow]
    val q = StreamingDedup.candidates(bands).writeStream
      .format("memory").queryName("dedup_cands")
      .outputMode("append")
      .start()
    try {
      docs.sortBy(_.doc_id).grouped(7).foreach { batch =>
        input.addData(batch: _*)
        q.processAllAvailable()
      }
      val cands = spark.table("dedup_cands").as[Candidate].collect().toSeq
      // soundness: every emitted candidate is a batch candidate pair
      cands.foreach { c =>
        assert(c.repId < c.docId)
        assert(batchPairs.contains((c.repId, c.docId)),
          s"streamed candidate $c is not a batch pair")
      }
      // completeness: exactly the docs with a smaller-id batch partner flag
      val expectedFlagged = batchPairs.map(_._2)
      assert(cands.map(_.docId).toSet == expectedFlagged)
      // the identical copies (ids 5..9 vs 0..4) must flag with their
      // group's base as rep in at least one band
      (0 until 5).foreach { g =>
        assert(cands.exists(c => c.docId == 5 + g && c.repId == g))
      }
    } finally q.stop()
  }

  test("cross-batch state: a later arrival flags against an earlier batch") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[StreamDoc]
    val bands = StreamingDedup
      .bandRows(input.toDF().toDF("doc_id", "text")).as[BandRow]
    val q = StreamingDedup.candidates(bands).writeStream
      .format("memory").queryName("dedup_cross")
      .outputMode("append")
      .start()
    try {
      val text = "one two three four five six seven eight nine ten"
      input.addData(StreamDoc(100L, text))
      q.processAllAvailable()
      assert(spark.table("dedup_cross").isEmpty)
      input.addData(StreamDoc(200L, text))
      q.processAllAvailable()
      val cands = spark.table("dedup_cross").as[Candidate].collect()
      assert(cands.nonEmpty && cands.forall(c => c.docId == 200L && c.repId == 100L))
    } finally q.stop()
  }
}

