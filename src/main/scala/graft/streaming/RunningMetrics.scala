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
  * output is bit-identical to folding the full history, regardless of how
  * the harness splits micro-batches (the reproducibility property the
  * reference gets from 2-day re-batch overlaps, SURVEY §2.9, without
  * recomputing anything).
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
