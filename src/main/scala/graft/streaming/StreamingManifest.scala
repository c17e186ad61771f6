package graft.streaming

import org.apache.spark.sql.{Column, Dataset, Encoders}
import org.apache.spark.sql.functions.{concat, lit, md5}
import org.apache.spark.sql.streaming._

import graft.functions.TextFunctions

/** Streaming content-addressed manifest — the incremental twin of the
  * batch Merkle manifest (q359), the StreamingQuantiles split: one
  * (n_docs, xor-of-leaves) pair per source in a `transformWithState`
  * ValueState, leaves folded in as documents arrive, the current
  * per-source digest re-emitted every micro-batch the source appears
  * in.
  *
  * xor is commutative, associative and self-inverse, so the running
  * digest is ARRIVAL-ORDER-FREE and micro-batch-split-free — after any
  * prefix of the stream it equals the batch `bit_xor` recompute over
  * the same rows exactly (the spec asserts both), and a RETRACTION is
  * the same fold (xor the leaf back out). State is two longs per
  * source — bounded by the source domain, not the corpus.
  */
object StreamingManifest {

  case class In(source: String, leaf: Long)
  case class Digest(source: String, nDocs: Long, digest: Long)
  case class MState(n: Long, x: Long)

  /** The shared leaf: 60-bit hash of (doc_id : content-md5) — ONE
    * definition feeding the batch query and the stream so the content
    * address cannot drift between them.
    */
  def leafCol(docId: Column, text: Column): Column =
    TextFunctions.hash60(concat(docId.cast("string"), lit(":"), md5(text)))

  class ManifestProcessor extends StatefulProcessor[String, In, Digest] {
    @transient private var state: ValueState[MState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[MState]("manifest",
        Encoders.product[MState], TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[In],
        timerValues: TimerValues): Iterator[Digest] = {
      var st = if (state.exists()) state.get() else MState(0L, 0L)
      rows.foreach(r => st = MState(st.n + 1L, st.x ^ r.leaf))
      state.update(st)
      Iterator.single(Digest(key, st.n, st.x))
    }
  }

  /** Current per-source digests after each micro-batch (Update mode). */
  def digests(ds: Dataset[In]): Dataset[Digest] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.source)
      .transformWithState(new ManifestProcessor, TimeMode.None(),
        OutputMode.Update())
  }
}
