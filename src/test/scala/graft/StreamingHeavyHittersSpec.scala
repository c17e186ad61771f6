package graft

import scala.collection.mutable

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.StreamingHeavyHitters
import graft.streaming.StreamingHeavyHitters.{Hit, In}

/** The streaming MG sketch must (a) satisfy the Misra-Gries guarantee
  * band against exact counts — est ≤ true ≤ est + n/(k+1), every item
  * with true frequency > n/(k+1) present — and (b) equal a sequential
  * reference replay of the same arrival order exactly, independent of
  * how the rows split across micro-batches.
  */
class StreamingHeavyHittersSpec extends SparkSpec {

  private val K = 4

  /** Skewed word stream: zipf-ish repeats so two items are true heavy
    * hitters over the n/(k+1) threshold and the tail churns the sketch.
    */
  private def words: Seq[String] = {
    val tail = (0 until 30).map(i => s"t$i")
    // deterministic interleave: heavy items dispersed through the tail
    val heavy = Seq.fill(25)("alpha") ++ Seq.fill(15)("beta") ++ Seq.fill(6)("gamma")
    (heavy ++ tail).zipWithIndex
      .sortBy { case (w, i) => (i * 7919) % 101 } // fixed pseudo-shuffle
      .map(_._1)
  }

  private def reference(ws: Seq[String]): Map[String, Long] = {
    val buf = mutable.HashMap.empty[String, Long]
    ws.foreach(w => StreamingHeavyHitters.mgUpdate(buf, w, K))
    buf.toMap
  }

  test("micro-batched sketch equals the sequential replay and keeps the MG band") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val ws = words
      val input = MemoryStream[In]
      val q = StreamingHeavyHitters.hits(input.toDS(), K).writeStream
        .format("memory").queryName("mg_hits").outputMode("update").start()
      try {
        // one key, rows arriving in fixed order across 7-row micro-batches;
        // MemoryStream preserves intra-batch order for a single partition
        ws.grouped(7).foreach { b =>
          input.addData(b.map(w => In("k1", w)): _*)
          q.processAllAvailable()
        }
        // last emission per term = final sketch state
        val batches = spark.table("mg_hits").as[Hit].collect()
        val finalSketch = reference(ws)
        // the stream's final micro-batch emission for key k1: reconstruct
        // from the latest estimates (Update mode re-emits whole sketch)
        val lastEst = batches.groupBy(_.term).map { case (t, hs) =>
          t -> hs.last.est
        }
        // (b) exact equality with the sequential replay's surviving terms
        assert(finalSketch.keySet.subsetOf(lastEst.keySet))
        finalSketch.foreach { case (t, c) => assert(lastEst(t) == c,
          s"term $t: stream ${lastEst(t)} vs reference $c") }
        // (a) the MG guarantee band vs exact truth
        val n = ws.size
        val slack = n / (K + 1)
        val truth = ws.groupBy(identity).map { case (w, g) => w -> g.size.toLong }
        finalSketch.foreach { case (t, est) =>
          val tr = truth(t)
          assert(est <= tr && tr <= est + slack, s"$t: est $est true $tr slack $slack")
        }
        truth.filter(_._2 > slack).keys.foreach { t =>
          assert(finalSketch.contains(t), s"guaranteed-frequent $t missing")
        }
      } finally q.stop()
    } finally spark.conf
      .unset("spark.sql.streaming.stateStore.providerClass")
  }

  test("sketch state stays bounded at k entries per key") {
    val buf = mutable.HashMap.empty[String, Long]
    (0 until 1000).foreach(i => StreamingHeavyHitters.mgUpdate(buf, s"w${i % 37}", K))
    assert(buf.size <= K)
  }
}
