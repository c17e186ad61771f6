package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.streaming.StreamingScd2
import graft.streaming.StreamingScd2.{Ev, Version}

/** Streaming SCD-2 version emission vs the batch change-point
  * computation: with event-time-ordered arrival per user (any
  * micro-batch split), the streamed (user, ver, value, effFrom) rows
  * must equal the batch lag-based change rows exactly — including
  * version counters that survive across micro-batch boundaries in the
  * keyed state.
  */
class StreamingScd2Spec extends SparkSpec {

  private def mkEvents: Seq[Ev] = {
    // 3 users with interleaved change patterns: u0 alternates every
    // event, u1 changes once mid-stream, u2 never changes. Event ids
    // break a deliberate tm tie (u1: tm 40 twice).
    val rows = Seq(
      Ev(0L, 10L, 1L, "view"), Ev(0L, 20L, 2L, "click"),
      Ev(0L, 30L, 3L, "view"), Ev(0L, 40L, 4L, "click"),
      Ev(1L, 10L, 5L, "view"), Ev(1L, 20L, 6L, "view"),
      Ev(1L, 40L, 7L, "purchase"), Ev(1L, 40L, 8L, "purchase"),
      Ev(2L, 15L, 9L, "view"), Ev(2L, 25L, 10L, "view"),
      Ev(2L, 35L, 11L, "view"))
    rows
  }

  private def batchExpected(evs: Seq[Ev]): Set[(Long, Long, String, Long)] = {
    import spark.implicits._
    val w = Window.partitionBy("userId").orderBy("tm", "eventId")
    evs.toDF()
      .withColumn("prev", lag("eventType", 1).over(w))
      .where(col("prev").isNull || col("prev") =!= col("eventType"))
      .withColumn("ver", row_number().over(
        Window.partitionBy("userId").orderBy("tm", "eventId")).cast("long"))
      .select("userId", "ver", "eventType", "tm")
      .as[(Long, Long, String, Long)].collect().toSet
  }

  test("ordered arrival emits exactly the batch change rows, across " +
      "micro-batch splits") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val evs = mkEvents
    val expected = batchExpected(evs)
    val input = MemoryStream[Ev]
    val q = StreamingScd2.versions(input.toDS()).writeStream
      .format("memory").queryName("scd2_stream")
      .outputMode("append")
      .start()
    try {
      // event-time order per user; split into 3-row micro-batches so
      // u0's alternation and u1's change straddle batch boundaries
      evs.sortBy(e => (e.tm, e.eventId)).grouped(3).foreach { b =>
        input.addData(b: _*)
        q.processAllAvailable()
      }
      val got = spark.table("scd2_stream").as[Version].collect()
        .map(v => (v.userId, v.ver, v.eventType, v.effFrom)).toSet
      assert(got == expected, s"streamed $got vs batch $expected")
      // u2 never changes -> exactly one version row
      assert(got.count(_._1 == 2L) == 1)
      // u0 alternates every event -> four version rows, versions 1..4
      assert(got.filter(_._1 == 0L).map(_._2) == Set(1L, 2L, 3L, 4L))
    } finally q.stop()
  }
}
