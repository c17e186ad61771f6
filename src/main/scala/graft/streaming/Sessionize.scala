package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Gap-based sessionization, batch and streaming.
  *
  * The reference has no streaming (SURVEY §2.9) — its incremental "append"
  * pipeline re-batches with a 2-day overlap. This module provides both
  * idioms: the batch form (declarative lag/cumsum windows, oracle-checkable)
  * and the Structured Streaming form (`flatMapGroupsWithState` with an
  * event-time timeout), which is the stretch design SURVEY §2.9 sketches for
  * stop detection.
  */
object Sessionize {

  /** Batch: session id = cumulative count of gaps > `gapSec` per user,
    * ordered by (ts, event_id). One shuffle on user_id; windows reuse the
    * same sort.
    */
  def batch(events: DataFrame, gapSec: Long): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    events
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_sess",
        when(col("prev_ts").isNull ||
          unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts")) > gapSec, 1L)
          .otherwise(0L))
      .withColumn("session_id",
        sum("new_sess").over(byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("prev_ts", "new_sess")
  }

  case class Evt(userId: Long, ts: Long, eventId: Long)
  case class SessionState(start: Long, last: Long, n: Long)
  case class Session(userId: Long, start: Long, end: Long, nEvents: Long)

  /** Streaming: one open session per user in state; a session closes when a
    * later event for the same user arrives beyond `gapSec` (deterministic,
    * data-driven closure). At scale state is partitioned by user and bounded
    * to one record per user. `streamingWithTimeout` below is the
    * watermark+`EventTimeTimeout` variant that also flushes sessions of
    * users that stop emitting entirely; closure-by-evidence here keeps
    * outputs reproducible (same property the reference's 2-day re-batch
    * overlap provides, SURVEY §2.9).
    */
  def streaming(events: Dataset[Evt], gapSec: Long): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.userId)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, batch: Iterator[Evt], state: GroupState[SessionState]) =>
          val evts = batch.toSeq.sortBy(e => (e.ts, e.eventId))
          var closed = List.empty[Session]
          var cur = state.getOption
          evts.foreach { e =>
            cur match {
              case Some(s) if e.ts - s.last <= gapSec =>
                cur = Some(SessionState(s.start, e.ts, s.n + 1))
              case Some(s) =>
                closed ::= Session(userId, s.start, s.last, s.n)
                cur = Some(SessionState(e.ts, e.ts, 1))
              case None =>
                cur = Some(SessionState(e.ts, e.ts, 1))
            }
          }
          cur.foreach(state.update)
          closed.reverseIterator
      }
  }

  case class TsEvt(userId: Long, ts: java.sql.Timestamp, eventId: Long)

  /** Streaming with event-time timeout: like `streaming`, but a session
    * ALSO closes when the watermark passes `last + gapSec` — a user that
    * stops emitting entirely still flushes once event time (driven by the
    * rest of the stream) moves on. `delaySec` is the watermark's
    * late-arrival allowance. State remains one record per user; the
    * timeout timestamp is re-armed on every update (clamped above the
    * current watermark, which a very late event could otherwise violate).
    */
  def streamingWithTimeout(
      events: Dataset[TsEvt], gapSec: Long, delaySec: Long): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", s"$delaySec seconds")
      .groupByKey(_.userId)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, batch: Iterator[TsEvt], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val out = state.getOption
              .map(s => Session(userId, s.start, s.last, s.n)).iterator
            state.remove()
            out
          } else {
            val evts = batch.toSeq.sortBy(e => (e.ts.getTime, e.eventId))
            var closed = List.empty[Session]
            var cur = state.getOption
            evts.foreach { e =>
              val t = e.ts.getTime / 1000
              cur match {
                case Some(s) if t - s.last <= gapSec =>
                  cur = Some(SessionState(s.start, t, s.n + 1))
                case Some(s) =>
                  closed ::= Session(userId, s.start, s.last, s.n)
                  cur = Some(SessionState(t, t, 1))
                case None =>
                  cur = Some(SessionState(t, t, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(
                math.max((s.last + gapSec) * 1000, state.getCurrentWatermarkMs + 1))
            }
            closed.reverseIterator
          }
      }
  }
}
