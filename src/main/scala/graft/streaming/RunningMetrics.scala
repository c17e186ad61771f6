package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming per-key running metrics via `flatMapGroupsWithState` — the
  * online twin of the batch windowed smoothers (q157): every event emits
  * its key's updated statistic, state is O(1) per key.
  *
  * The recursion s' = (s + v) / 2 (EWMA, alpha = 1/2) is evaluated in the
  * same order the batch replay uses — events sorted by (ts, eventId)
  * within each micro-batch, state carrying across batches — so the stream
  * output is bit-identical to folding the full history PROVIDED batch
  * boundaries respect event-time order (each batch's events are all later
  * than the previous batch's, the property the spec's split exercises).
  * An out-of-order arrival that lands in a LATER micro-batch folds in
  * arrival order, not event order: nothing here buffers or drops late
  * data. Production hardening for unordered sources is a watermark plus
  * per-key buffering of the allowed-lateness span before folding — at
  * which point exactness holds only within the lateness bound, the same
  * trade every watermarked operator makes.
  */
object RunningMetrics {

  case class VEvt(userId: Long, ts: Long, eventId: Long, v: Double)
  case class EwmaState(s: Double, n: Long)
  case class EwmaOut(userId: Long, eventId: Long, ewma: Double, nSeen: Long)

  def ewmaStreaming(events: Dataset[VEvt]): Dataset[EwmaOut] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.userId)
      .flatMapGroupsWithState[EwmaState, EwmaOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, batch: Iterator[VEvt], state: GroupState[EwmaState]) =>
          val evts = batch.toSeq.sortBy(e => (e.ts, e.eventId))
          var cur = state.getOption
          val out = evts.map { e =>
            cur = cur match {
              case Some(st) => Some(EwmaState((st.s + e.v) * 0.5, st.n + 1))
              case None => Some(EwmaState(e.v, 1L))
            }
            EwmaOut(userId, e.eventId, cur.get.s, cur.get.n)
          }
          cur.foreach(state.update)
          out.iterator
      }
  }
}
