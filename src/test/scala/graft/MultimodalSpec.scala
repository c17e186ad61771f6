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

  /** In-memory PNG via the JDK's own encoder — real bytes, no fixture file. */
  def pngBytes(w: Int, h: Int, argb: Boolean): Array[Byte] = {
    val kind =
      if (argb) java.awt.image.BufferedImage.TYPE_INT_ARGB
      else java.awt.image.BufferedImage.TYPE_3BYTE_BGR
    val img = new java.awt.image.BufferedImage(w, h, kind)
    for (x <- 0 until w; y <- 0 until h)
      img.setRGB(x, y, (x * 31 + y) | 0xff000000)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("real PNG payloads decode to true dimensions and channel count") {
    import spark.implicits._
    val df = Seq((1L, pngBytes(17, 9, argb = true)),
        (2L, pngBytes(33, 21, argb = false)),
        (3L, "not an image at all".getBytes("UTF-8")))
      .toDF("id", "payload")
    val out = Multimodal.withDecodedMeta(df, "payload")
      .select(col("id"), col("meta.format"), col("meta.width"),
        col("meta.height"), col("meta.channels")).collect()
      .map(r => r.getLong(0) ->
        ((r.getString(1), r.getInt(2), r.getInt(3), r.getInt(4)))).toMap
    assert(out(1L) == ("png", 17, 9, 4))
    assert(out(2L) == ("png", 33, 21, 3))
    // non-image payload falls back to the deterministic fake (19 bytes,
    // first byte 'n' = 110 -> 110 % 3 = 2 -> "wav", 1 channel)
    assert(out(3L) == ("wav", 64 + 19, 64 + (19 * 31 + 110) % 577, 1))
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
