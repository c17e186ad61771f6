package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.OhlcStream
import graft.streaming.OhlcStream.Tick

/** Streaming OHLC bars through MemoryStream: append-mode emission only
  * after the watermark seals a window, and equivalence with the batch
  * q317 row_number formulation on the same ticks (including the
  * same-timestamp tie broken by eventId).
  */
class OhlcStreamSpec extends SparkSpec {
  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("watermarked OHLC bars emit sealed windows equal to the batch twin") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Tick]
    val bars = OhlcStream.bars(input.toDS())
    val q = bars.writeStream.format("memory").queryName("ohlc_out")
      .outputMode("append").start()
    try {
      // one hour-window of ticks, with a same-ts tie (ids 3, 4) so the
      // close must come from the higher eventId
      val b1 = Seq(
        Tick("a", ts("2024-01-01 10:05:00"), 1L, 500L),
        Tick("a", ts("2024-01-01 10:20:00"), 2L, 300L),
        Tick("a", ts("2024-01-01 10:40:00"), 3L, 700L),
        Tick("a", ts("2024-01-01 10:40:00"), 4L, 100L))
      input.addData(b1: _*)
      q.processAllAvailable()
      assert(spark.table("ohlc_out").isEmpty) // window still open

      // a late-hour tick drives the watermark past 11:00 -> bar seals
      input.addData(Tick("a", ts("2024-01-01 12:30:00"), 5L, 900L))
      q.processAllAvailable()
      val out = spark.table("ohlc_out")
        .select("eventType", "w_start", "open_e2", "high_e2", "low_e2",
          "close_e2", "volume_e2", "n")
        .as[(String, java.sql.Timestamp, Long, Long, Long, Long, Long, Long)]
        .collect().toSet
      assert(out ==
        Set(("a", ts("2024-01-01 10:00:00"), 500L, 700L, 100L, 100L, 1600L, 4L)),
        s"unexpected sealed bars: $out")

      // batch twin: the q317 row_number formulation over the same ticks
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.functions._
      val wa = Window.partitionBy("eventType", "hr")
        .orderBy(asc("ts"), asc("eventId"))
      val wd = Window.partitionBy("eventType", "hr")
        .orderBy(desc("ts"), desc("eventId"))
      val batch = b1.toDF()
        .withColumn("hr", expr("unix_micros(ts) div 3600000000"))
        .withColumn("ra", row_number().over(wa))
        .withColumn("rd", row_number().over(wd))
        .groupBy("eventType", "hr")
        .agg(max(when(col("ra") === 1, col("vE2"))).as("open_e2"),
          max("vE2").as("high_e2"), min("vE2").as("low_e2"),
          max(when(col("rd") === 1, col("vE2"))).as("close_e2"),
          sum("vE2").as("volume_e2"), count(lit(1)).as("n"))
        .select("open_e2", "high_e2", "low_e2", "close_e2", "volume_e2", "n")
        .as[(Long, Long, Long, Long, Long, Long)].collect().toSet
      assert(batch == Set((500L, 700L, 100L, 100L, 1600L, 4L)),
        s"batch twin disagrees: $batch")
    } finally q.stop()
  }
}
