package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.functions.{MrlOps, QuantileSketchState}
import graft.streaming.StreamingQuantiles
import graft.streaming.StreamingQuantiles.{Deciles, In}

/** The streaming MRL sketch must (a) equal a sequential replay of the
  * same arrival order through the same MrlOps core — micro-batch splits
  * must not change the result — and (b) keep every decile estimate's
  * exact rank inside the deterministic band.
  */
class StreamingQuantilesSpec extends SparkSpec {

  private val K = 64

  /** Deterministic pseudo-shuffled stream of 0..n-1. */
  private def vals(n: Int): Seq[Long] =
    (0 until n).sortBy(i => (i * 7919) % 4801).map(_.toLong)

  test("micro-batched sketch equals the sequential replay and stays in band") {
    implicit val sq = spark.sqlContext
    import spark.implicits._
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val n = 3000
    val ws = vals(n)
    val input = MemoryStream[In]
    val q = StreamingQuantiles.deciles(input.toDS(), K).writeStream
      .format("memory").queryName("mrl_deciles").outputMode("update").start()
    try {
      ws.grouped(137).foreach { b =>
        input.addData(b.map(v => In("k1", v)): _*)
        q.processAllAvailable()
      }
      val rows = spark.table("mrl_deciles").as[Deciles].collect()
      val last = rows.last
      assert(last.n == n)
      // (a) sequential replay through the same core — bit-equal
      val ref = new QuantileSketchState
      ws.foreach(v => MrlOps.insert(ref, v, K))
      assert(last.ests == MrlOps.deciles(ref).toSeq)
      // (b) the deterministic band against exact ranks (values are
      // 0..n-1, so rank of value v is v+1)
      val levels = math.ceil(math.log(2.0 * n / K) / math.log(2.0)).toLong + 2
      val band = 2 * levels * n / (K - 1) + K
      for (d <- 1 to 9) {
        val target = d.toLong * n / 10
        val rank = last.ests(d - 1) + 1
        assert(math.abs(rank - target) <= band,
          s"decile $d: rank $rank vs $target, band $band")
      }
    } finally q.stop()
  }
}
