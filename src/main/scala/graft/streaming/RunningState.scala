package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming._

/** Per-key running totals on the Spark 4 `transformWithState` API — the
  * successor of `mapGroupsWithState` (which `RunningMetrics`/`Sessionize`
  * use): typed named-state handles (`ValueState`/`ListState`/`MapState`),
  * per-state TTL, timers decoupled from output mode, and state schema
  * evolution. This operator keeps ONE `ValueState[(count, sum)]` per key
  * and emits the running pair on every micro-batch a key appears in — the
  * incremental twin of a batch `groupBy(k).agg(count, sum)`, and like
  * RunningMetrics its output is invariant to how rows split across
  * micro-batches (addition is associative; state carries the prefix).
  *
  * Requires the RocksDB state store provider (the TWS operator does not
  * run on the default HDFS-backed store) — which is also the right
  * provider at scale: state lives off-heap and spills to disk instead of
  * competing with execution memory.
  */
object RunningState {

  case class In(k: Long, v: Long)
  case class Out(k: Long, n: Long, total: Long)

  class TotalsProcessor extends StatefulProcessor[Long, In, Out] {
    @transient private var state: ValueState[(Long, Long)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[(Long, Long)]("totals",
        Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong), TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[In],
        timerValues: TimerValues): Iterator[Out] = {
      var (n, tot) = if (state.exists()) state.get() else (0L, 0L)
      rows.foreach { r => n += 1; tot += r.v }
      state.update((n, tot))
      Iterator.single(Out(key, n, tot))
    }
  }

  /** Running (count, sum) per key; emits one row per key per micro-batch
    * the key appears in (Update mode).
    */
  def totals(ds: Dataset[In]): Dataset[Out] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.k)
      .transformWithState(new TotalsProcessor, TimeMode.None(),
        OutputMode.Update())
  }
}
