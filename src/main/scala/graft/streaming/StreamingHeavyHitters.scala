package graft.streaming

import scala.collection.mutable

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming._

/** Streaming Misra-Gries heavy hitters per key — the incremental twin of
  * the batch `graft_heavy_hitters` TypedImperativeAggregate (q115/q209):
  * one bounded (≤ k entries) sketch per key in a `transformWithState`
  * ValueState, updated with the classic MG step as rows arrive, current
  * candidates re-emitted every micro-batch the key appears in.
  *
  * The MG guarantee is ORDER-ROBUST (Agarwal et al., PODS'12): for any
  * arrival order and any micro-batch split, after n updates every stored
  * estimate satisfies `true − n/(k+1) ≤ est ≤ true` and any item with
  * true frequency > n/(k+1) is present. The estimates themselves depend
  * on order — so the spec asserts (a) the guarantee band against exact
  * counts and (b) exact equality with a sequential reference replay of
  * the same arrival order, the strongest properties an online sketch
  * offers (same posture as the batch agg's q115 guarantee booleans).
  *
  * Scale shape: state is k pairs per key — fixed-size regardless of
  * stream length, the whole point of the sketch; RocksDB-backed like
  * `RunningState` (TWS requires that provider, and off-heap state is the
  * right place for a million-key sketch table anyway).
  */
object StreamingHeavyHitters {

  case class In(key: String, term: String)
  case class Hit(key: String, term: String, est: Long)
  /** Parallel lists (product-encodable) of the sketch's ≤ k entries. */
  case class SketchState(terms: List[String], counts: List[Long])

  /** The MG update — mirror of `HeavyHittersAgg.update` on plain strings:
    * increment if present; insert at 1 if below capacity; else the
    * decrement-all step (unseen item and every stored count each pay 1).
    */
  def mgUpdate(buf: mutable.HashMap[String, Long], term: String, k: Int): Unit =
    buf.get(term) match {
      case Some(c) => buf.update(term, c + 1L)
      case None if buf.size < k => buf.update(term, 1L)
      case None =>
        val dead = mutable.ArrayBuffer.empty[String]
        buf.keysIterator.foreach { t =>
          val c = buf(t) - 1L
          if (c <= 0L) dead += t else buf.update(t, c)
        }
        dead.foreach(buf.remove)
    }

  class MgProcessor(k: Int) extends StatefulProcessor[String, In, Hit] {
    @transient private var state: ValueState[SketchState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[SketchState]("mg",
        Encoders.product[SketchState], TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[In],
        timerValues: TimerValues): Iterator[Hit] = {
      val buf = mutable.HashMap.empty[String, Long]
      if (state.exists()) {
        val s = state.get()
        s.terms.iterator.zip(s.counts.iterator).foreach { case (t, c) =>
          buf.update(t, c)
        }
      }
      rows.foreach(r => mgUpdate(buf, r.term, k))
      val sorted = buf.toSeq.sortBy { case (t, c) => (-c, t) }
      state.update(SketchState(
        sorted.map(_._1).toList, sorted.map(_._2).toList))
      sorted.iterator.map { case (t, c) => Hit(key, t, c) }
    }
  }

  /** Current per-key sketch after each micro-batch (Update mode): rows
    * (key, term, est) sorted within a key by (est desc, term) like the
    * batch aggregate's eval arrangement.
    */
  def hits(ds: Dataset[In], k: Int): Dataset[Hit] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.key)
      .transformWithState(new MgProcessor(k), TimeMode.None(),
        OutputMode.Update())
  }
}
