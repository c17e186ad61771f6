package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal

class MultimodalSpec extends SparkSpec {

  def media() = {
    import spark.implicits._
    Seq((1L, "hello world payload".getBytes("UTF-8")),
        (2L, Array.fill[Byte](1000)(7)),
        (3L, Array.emptyByteArray))
      .toDF("id", "payload")
  }

  test("decode attaches typed metadata; empty payload safe") {
    val out = Multimodal.withDecodedMeta(media(), "payload")
      .select(col("id"), col("meta.format"), col("meta.n_bytes")).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(out(1L)._2 == 19L)
    assert(out(2L)._2 == 1000L)
    assert(out(3L) == ("empty", 0L))
  }

  test("frame sampling conserves bytes and ordering") {
    val frames = Multimodal.withFrames(media().where(col("id") === 2), "payload", 4)
      .select(col("frame_idx"), length(col("frame")).as("len"))
      .collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
    assert(frames == Map(0 -> 250, 1 -> 250, 2 -> 250, 3 -> 250))
    val total = Multimodal.withFrames(media().where(col("id") === 1), "payload", 4)
      .agg(sum(length(col("frame")))).collect().head.getLong(0)
    assert(total == 19L)
  }

  test("resize stub is deterministic and size-exact") {
    val r = Multimodal.resizeStub(Array.fill[Byte](100)(1), 8, 8)
    assert(r.length == 64)
    assert(r.take(64).forall(_ == 1))
  }
}
