package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream interval join (click attribution shape): match right-side
  * events to left-side events on a key within a bounded event-time window.
  *
  * The time bound is what makes this run forever: with both sides
  * watermarked AND the join condition constraining `rightTs` to
  * [leftTs, leftTs + windowSec], Spark derives how long each side's rows
  * can still find a partner and EVICTS buffered state once the watermark
  * passes that bound — join state stays proportional to the window, not
  * the stream. An unconstrained stream-stream equi-join would buffer both
  * streams unboundedly.
  *
  * Batch twin: q81's bounded range join (same condition, no state).
  */
object StreamJoin {

  /** `left` ⋈ `right` on `key`, with `right.rightTs` in
    * [left.leftTs, left.leftTs + windowSec]. Both inputs must carry their
    * event-time column under distinct names; `delay` is the watermark
    * (out-of-orderness tolerance) applied to each side.
    */
  def interval(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, windowSec: Long,
      delay: String = "10 seconds"): DataFrame = {
    val l = left.withWatermark(leftTs, delay)
    val r = right.withWatermark(rightTs, delay)
    l.join(r, l(key) === r(key) &&
        r(rightTs) >= l(leftTs) &&
        r(rightTs) <= l(leftTs) + expr(s"INTERVAL $windowSec SECOND"))
      .drop(r(key))
  }

  /** Stream-static dimension enrichment: join each micro-batch of the
    * stream against a STATIC dim on `key`, broadcast. Unlike the
    * stream-stream form above this is completely stateless — the dim is
    * broadcast once per micro-batch plan and the join runs map-side, so
    * there is no watermark, no state store, and nothing to evict; left
    * outer keeps stream rows whose key has no dim match (the standard
    * late-dimension posture). The batch twin is the plain broadcast dim
    * join (q08).
    */
  def enrich(stream: DataFrame, dim: DataFrame, key: String): DataFrame =
    stream.join(broadcast(dim), Seq(key), "left")

  /** LEFT OUTER stream-stream interval join: like `interval`, plus every
    * unmatched left row is emitted WITH NULLS once the watermark proves
    * no partner can still arrive (left_ts + window has passed both
    * watermarks) — the "impressions that never converted" stream, which
    * an inner join can never produce. The watermark + time-range bound
    * is what makes outer emission decidable with finite state: state for
    * a left row is dropped exactly when its null-or-not fate is sealed.
    */
  def intervalOuter(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, windowSec: Long,
      delay: String = "10 seconds"): DataFrame = {
    val l = left.withWatermark(leftTs, delay)
    val r = right.withWatermark(rightTs, delay)
    l.join(r, l(key) === r(key) &&
        r(rightTs) >= l(leftTs) &&
        r(rightTs) <= l(leftTs) + expr(s"INTERVAL $windowSec SECOND"),
        "left_outer")
      .drop(r(key))
  }
}
