package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.functions.TextFunctions
import graft.operators.Dedup

/** Streaming near-duplicate detection — the continuous-ingestion form of
  * the MinHash+LSH batch path (`Dedup.lshCandidatePairs`): as documents
  * arrive, each is flagged against everything seen BEFORE it, with state
  * bounded to one long per occupied LSH bucket.
  *
  * Shape: band keys are computed MAP-SIDE per row (no stateful aggregation
  * before the keyed state): the per-doc base-hash array is materialized in
  * one projection and the 32 permuted minima read that array — the md5
  * hashing runs once per shingle per row (the `bandKeysRows` codegen
  * lesson: re-inlining the hashing into every perm is the measured compile
  * blowup). Each (band, key) group then keeps only the MINIMUM doc id ever
  * seen in that bucket (`flatMapGroupsWithState`), and a later arrival in
  * an occupied bucket emits a candidate (doc, rep = that minimum).
  *
  * Contract (spec-pinned): when documents arrive in id order (any
  * micro-batch split), every doc that shares a bucket with a smaller-id
  * doc emits at least one candidate, and every emitted candidate is a
  * batch `lshCandidatePairs` pair — detection is exactly the batch
  * verdict. Under arbitrary arrival order, detection is eventual: the
  * smaller id must be seen first (the standard streaming caveat; the
  * batch path is the backfill). At 100 TB the state is one long per
  * OCCUPIED bucket, partitioned by (band, key); production would add a
  * state TTL for buckets cold past the dedup horizon.
  */
object StreamingDedup {

  case class BandRow(band: Int, key: String, docId: Long)
  case class Candidate(docId: Long, band: Int, repId: Long)

  /** Map-side band keys for a (doc_id, text) frame — streaming-safe
    * (no aggregation): same signature/banding parameters and values as
    * `Dedup.bandKeysRows`, so candidates line up with the batch path.
    */
  def bandRows(docs: DataFrame, p: Dedup.MinHashParams = Dedup.MinHashParams()): DataFrame = {
    val rows = p.numPerms / p.bands
    val hs = transform(Dedup.shingles(col("text"), p.shingleSize),
      s => TextFunctions.hash60(s) % p.baseMod)
    val sigCols = (0 until p.numPerms).map { i =>
      val a = 2L * i + 1; val b = 98765L * i + 12345L
      array_min(transform(col("hs"), h => (h * a + b) % p.prime)).as(s"s$i")
    }
    val bandStructs = (0 until p.bands).map { bnd =>
      struct(lit(bnd).as("band"),
        concat_ws("_", (0 until rows).map(r => col(s"s${bnd * rows + r}")): _*).as("key"))
    }
    docs
      .where(size(TextFunctions.tokens(col("text"))) >= p.shingleSize)
      .select(col("doc_id"), hs.as("hs"))
      .select(col("doc_id") +: sigCols: _*)
      .select(col("doc_id"), explode(array(bandStructs: _*)).as("bk"))
      .select(col("bk.band").as("band"), col("bk.key").as("key"),
        col("doc_id").as("docId"))
  }

  /** Keyed state step: per (band, key) bucket, remember the min doc id;
    * later arrivals emit (doc, band, rep). Within a micro-batch the
    * bucket's rows are processed in doc-id order, so same-batch
    * duplicates resolve exactly like sequential arrival.
    */
  def candidates(bands: Dataset[BandRow]): Dataset[Candidate] = {
    import bands.sparkSession.implicits._
    bands
      .groupByKey(r => (r.band, r.key))
      .flatMapGroupsWithState[Long, Candidate](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (bk: (Int, String), rows: Iterator[BandRow], state: GroupState[Long]) =>
          val ids = rows.map(_.docId).toSeq.sorted
          var minSeen = state.getOption.getOrElse(Long.MaxValue)
          val out = Seq.newBuilder[Candidate]
          ids.foreach { id =>
            if (minSeen < id) out += Candidate(id, bk._1, minSeen)
            if (id < minSeen) minSeen = id
          }
          state.update(minSeen)
          out.result().iterator
      }
  }
}
