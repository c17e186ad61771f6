package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Streaming OHLC bars: watermarked event-time tumbling windows with
  * order-deterministic open/close — the streaming twin of batch
  * q317_ohlc_bars. The batch form uses row_number over the total
  * (ts, eventId) order; ranking windows are illegal inside a streaming
  * aggregation, so here open/close are `min_by`/`max_by` against the
  * SAME total-order key packed as a struct — identical semantics
  * (the key is unique per tick), and min_by/max_by partials are
  * mergeable, so the aggregation stays a normal streaming hash agg.
  *
  * Append mode: a bar emits exactly once, when the watermark seals its
  * window. Live state is one partial OHLC tuple per open (type, window)
  * — O(#types) per window span, independent of tick volume.
  */
object OhlcStream {

  case class Tick(eventType: String, ts: java.sql.Timestamp, eventId: Long,
      vE2: Long)

  def bars(ticks: Dataset[Tick], windowLen: String = "1 hour",
      watermark: String = "10 minutes"): DataFrame =
    ticks.withWatermark("ts", watermark)
      .groupBy(col("eventType"), window(col("ts"), windowLen))
      .agg(
        min_by(col("vE2"), struct(col("ts"), col("eventId"))).as("open_e2"),
        max(col("vE2")).as("high_e2"),
        min(col("vE2")).as("low_e2"),
        max_by(col("vE2"), struct(col("ts"), col("eventId"))).as("close_e2"),
        sum(col("vE2")).as("volume_e2"),
        count(lit(1)).as("n"))
      .select(col("eventType"), col("window.start").as("w_start"),
        col("open_e2"), col("high_e2"), col("low_e2"), col("close_e2"),
        col("volume_e2"), col("n"))
}
