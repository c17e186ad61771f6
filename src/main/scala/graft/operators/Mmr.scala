package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._

import scala.collection.mutable

/** Maximal Marginal Relevance rerank (Carbonell & Goldstein, SIGIR'98) of
  * per-query candidate lists — the standard diversified re-ranking step a
  * retrieval pipeline runs AFTER the ANN/BM25 candidate fetch (the
  * reference's adaptive-retrieval stage,
  * `twitter-analytics/code/5-active_learning/adaptive_retrieval/`, draws
  * its exploitation set this way conceptually: relevance first, but not k
  * near-copies of the same hit).
  *
  * Greedy selection: pick 1 = highest relevance; pick t>1 maximizes
  * `rel(c) − max_{s∈selected} sim(c, s)` (λ = 0.5 up to scale), ties to
  * the lower id. All scores are integer micro-units quantized BEFORE the
  * greedy walk, so the selection is exactly replayable by the oracle's
  * unrolled per-step SQL — no float compare inside the sequential part.
  *
  * Scale shape: one hash shuffle on query_id, then per-query in-memory
  * greedy over a candidate pool the caller already bounded (top-N from the
  * ANN stage). Queries are embarrassingly parallel; state per group is
  * O(pool²) pair rows, bounded by construction — the same
  * `groupByKey.flatMapGroups` posture as `Stops`.
  */
object Mmr {

  /** Input row: one candidate PAIR within a query's pool. `relA` is the
    * relevance of candidate `a`; `sim` the a↔b similarity (both integer
    * micro-units). Pools of size 1 are representable as a self-pair
    * (a == b, sim ignored).
    */
  case class Pair(queryId: Long, a: Long, b: Long, relA: Long, sim: Long)

  /** `pairs` columns: query_id, a, b, rel_a_e6, sim_e6 (a ≠ b covers every
    * ordered in-pool pair). Returns (query_id, pos, vec_id, score_e6) —
    * `score_e6` is the MMR objective of the winning pick (= rel for pos 1).
    */
  def rerank(pairs: DataFrame, k: Int): DataFrame = {
    val ss = pairs.sparkSession
    import ss.implicits._
    val ds = pairs.select(
      col("query_id").cast("long"), col("a").cast("long"), col("b").cast("long"),
      col("rel_a_e6").cast("long"), col("sim_e6").cast("long"))
      .as[(Long, Long, Long, Long, Long)]
      .map(r => Pair(r._1, r._2, r._3, r._4, r._5))(Encoders.product[Pair])
    ds.groupByKey(_.queryId)
      .flatMapGroups { (qid: Long, it: Iterator[Pair]) =>
        val rel = mutable.LongMap.empty[Long]
        val sim = mutable.HashMap.empty[(Long, Long), Long]
        it.foreach { p =>
          rel(p.a) = p.relA
          if (p.a != p.b) sim((p.a, p.b)) = p.sim
        }
        val remaining = mutable.SortedSet.empty[Long] ++ rel.keys
        val selected = mutable.ArrayBuffer.empty[Long]
        val out = mutable.ArrayBuffer.empty[(Long, Int, Long, Long)]
        var pos = 1
        while (pos <= k && remaining.nonEmpty) {
          var bestId = -1L
          var bestScore = Long.MinValue
          // iterate in ascending id order so ties keep the LOWER id
          remaining.foreach { c =>
            val maxSim =
              if (selected.isEmpty) 0L
              else selected.iterator.map(s => sim.getOrElse((c, s), Long.MinValue)).max
            val score = rel(c) - maxSim
            if (score > bestScore) { bestScore = score; bestId = c }
          }
          remaining -= bestId
          selected += bestId
          out += ((qid, pos, bestId, bestScore))
          pos += 1
        }
        out.iterator
      }
      .toDF("query_id", "pos", "vec_id", "score_e6")
  }
}
