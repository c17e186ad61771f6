package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming SCD Type-2 version emission — the CDC-as-a-stream twin of
  * the batch q407 dimension build: as events arrive, each user's keyed
  * state remembers (last attribute value, version count) and a row is
  * emitted ONLY when the tracked attribute changes — the live feed a
  * warehouse merges into the versioned dimension between batch rebuilds.
  *
  * State is two fields per user (bounded by the user population, not the
  * event volume); within a micro-batch a user's rows are processed in
  * (tm, eventId) order, so same-batch changes resolve exactly like
  * sequential arrival.
  *
  * Contract (spec-pinned): when each user's events arrive in event-time
  * order across micro-batches (any batch split), the emitted
  * (user, ver, value, effFrom) rows are EXACTLY the batch q407 rows
  * projected to their open side (batch additionally closes each version
  * with the next one's effFrom — derivable downstream as
  * lead(effFrom)). Under out-of-order arrival the stream emits the
  * change-points of the ARRIVAL sequence (the standard streaming
  * caveat); the batch path is the corrective rebuild.
  */
object StreamingScd2 {

  case class Ev(userId: Long, tm: Long, eventId: Long, eventType: String)
  case class Version(userId: Long, ver: Long, eventType: String, effFrom: Long)

  def versions(evs: Dataset[Ev]): Dataset[Version] = {
    import evs.sparkSession.implicits._
    evs
      .groupByKey(_.userId)
      .flatMapGroupsWithState[(String, Long), Version](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[Ev], state: GroupState[(String, Long)]) =>
          val sorted = rows.toSeq.sortBy(r => (r.tm, r.eventId))
          var (last, ver) = state.getOption.getOrElse((null: String, 0L))
          val out = Seq.newBuilder[Version]
          sorted.foreach { r =>
            if (last == null || last != r.eventType) {
              ver += 1
              out += Version(uid, ver, r.eventType, r.tm)
              last = r.eventType
            }
          }
          state.update((last, ver))
          out.result().iterator
      }
  }
}
