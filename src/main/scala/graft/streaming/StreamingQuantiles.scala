package graft.streaming

import scala.collection.mutable

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming._

import graft.functions.{MrlOps, QuantileSketchState}

/** Streaming MRL quantile sketch per key — the incremental twin of the
  * batch `graft_quantile_sketch` TypedImperativeAggregate (q346), the
  * same split as StreamingHeavyHitters / HeavyHittersAgg: one bounded
  * compactor stack per key in a `transformWithState` ValueState, rows
  * folded in as they arrive, current decile estimates re-emitted every
  * micro-batch the key appears in.
  *
  * The MRL rank-error guarantee is ORDER-ROBUST (each level-l
  * compaction perturbs any rank by ≤ 2^l regardless of when it fires),
  * so the band 2·L·n/(k−1) + k holds for any arrival order and any
  * micro-batch split. The estimates themselves depend on order — the
  * spec asserts (a) the band against exact ranks and (b) exact equality
  * with a sequential replay of the same arrival order through the SAME
  * MrlOps core, the strongest properties an online sketch offers.
  *
  * Scale shape: state is O(k·log(n/k)) values per key — effectively
  * fixed-size; RocksDB-backed like the other TWS processors.
  */
object StreamingQuantiles {

  case class In(key: String, v: Long)
  case class Deciles(key: String, n: Long, ests: Seq[Long])
  /** Product-encodable snapshot of QuantileSketchState. */
  case class QState(n: Long, parity: List[Int], levels: List[List[Long]])

  def toState(q: QState): QuantileSketchState = {
    val st = new QuantileSketchState
    st.n = q.n
    st.levels.clear(); st.parity.clear()
    q.levels.foreach(l => st.levels += mutable.ArrayBuffer(l: _*))
    q.parity.foreach(p => st.parity += p)
    if (st.levels.isEmpty) {
      st.levels += mutable.ArrayBuffer.empty[Long]; st.parity += 0
    }
    st
  }

  def fromState(st: QuantileSketchState): QState =
    QState(st.n, st.parity.toList, st.levels.map(_.toList).toList)

  class MrlProcessor(k: Int) extends StatefulProcessor[String, In, Deciles] {
    @transient private var state: ValueState[QState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[QState]("mrl",
        Encoders.product[QState], TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[In],
        timerValues: TimerValues): Iterator[Deciles] = {
      val st =
        if (state.exists()) toState(state.get())
        else new QuantileSketchState
      rows.foreach(r => MrlOps.insert(st, r.v, k))
      state.update(fromState(st))
      Iterator.single(Deciles(key, st.n, MrlOps.deciles(st).toSeq))
    }
  }

  /** Current per-key decile estimates after each micro-batch (Update
    * mode) — the eval arrangement of the batch aggregate, continuously.
    */
  def deciles(ds: Dataset[In], k: Int): Dataset[Deciles] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.key)
      .transformWithState(new MrlProcessor(k), TimeMode.None(),
        OutputMode.Update())
  }
}
