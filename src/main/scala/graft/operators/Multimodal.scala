package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column handling: media travel as opaque
  * `binary` columns with typed metadata structs; decode / feature-extract /
  * resize / frame-sample run as partition-batched JVM ops.
  *
  * CODEC NOTE: image metadata decode is REAL for every format the JDK's
  * `javax.imageio` registry reads (PNG always; typically JPEG/GIF/BMP too)
  * — true pixel dimensions and raster band count from the decoded image,
  * no extra dependency. Payloads no installed reader recognizes (audio,
  * video, and the oracle fixtures' UTF-8 text payloads) fall back to a
  * deterministic fake so cross-engine checks stay SQL-replayable.
  * `resizeStub` and `frameSample` remain deterministic fakes clearly
  * marked below — the Spark-side contract (schema, partition batching,
  * typed output, explode shape) is real and tested; swapping a fake for a
  * codec (javacv, TwelveMonkeys, ffmpeg-over-pipe) changes only the
  * function body.
  *
  * Scale shape: decode is a map-only pass — no shuffle; `mapPartitions`
  * amortizes any per-batch codec init across the partition (the same reason
  * the reference batches BERT inference, SURVEY F10). Binary columns ride
  * parquet byte arrays, so column pruning keeps scans cheap when metadata
  * alone is queried.
  */
object Multimodal {

  val metaSchema: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("channels", IntegerType),
    StructField("n_bytes", LongType)))

  /** REAL image decode via `javax.imageio`: if any registered reader
    * recognizes the payload's magic bytes, return its format name, true
    * pixel dimensions and raster band count (channels). Readers sniff the
    * signature before committing, so text/audio payloads return None
    * cheaply; a corrupt image that matches a signature but fails to parse
    * also returns None rather than poisoning the partition.
    */
  def decodeImage(bytes: Array[Byte]): Option[(String, Int, Int, Int, Long)] = {
    // MemoryCacheImageInputStream, NOT ImageIO.createImageInputStream: the
    // factory's default cache writes a temp FILE per payload — a disk
    // round-trip in the per-row hot path for bytes already on the heap.
    val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
      new java.io.ByteArrayInputStream(bytes))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) None
      else {
        val r = readers.next()
        try {
          r.setInput(iis)
          // Header-only reads: width/height/band-count come from the
          // image header and type specifiers without decoding pixels;
          // full read(0) only as a last-resort band-count fallback.
          val w = r.getWidth(0)
          val h = r.getHeight(0)
          val bands = Option(r.getRawImageType(0)).map(_.getNumBands)
            .orElse {
              val it = r.getImageTypes(0)
              if (it != null && it.hasNext) Some(it.next().getNumBands)
              else None
            }
            .getOrElse(r.read(0).getRaster.getNumBands)
          Some((r.getFormatName.toLowerCase(java.util.Locale.ROOT),
            w, h, bands, bytes.length.toLong))
        } catch {
          // NonFatal, not just IOException: ImageIO readers throw
          // IllegalArgument/ArrayIndexOutOfBounds/NegativeArraySize on
          // garbage that happens to match a signature — any of those must
          // fall back to the fake, not fail the Spark task.
          case scala.util.control.NonFatal(_) => None
        }
        finally r.dispose()
      }
    } finally if (iis != null) iis.close()
  }

  /** Decode metadata: the REAL `decodeImage` when a codec matches, else a
    * deterministic fake derived from content bytes (kept for payloads with
    * no JVM codec — and it is what makes the oracle fixtures, which carry
    * UTF-8 text payloads, SQL-replayable: fake channels are a pure
    * function of the fake format).
    */
  def decodeMeta(bytes: Array[Byte]): (String, Int, Int, Int, Long) = {
    if (bytes == null || bytes.isEmpty) ("empty", 0, 0, 0, 0L)
    else decodeImage(bytes).getOrElse {
      val b0 = bytes(0) & 0xff
      val fmt = if (b0 % 3 == 0) "jpeg" else if (b0 % 3 == 1) "png" else "wav"
      val channels = fmt match { case "jpeg" => 3; case "png" => 4; case _ => 1 }
      val width = 64 + (bytes.length % 577).toInt
      val height = 64 + ((bytes.length * 31 + b0) % 577).toInt
      (fmt, width, height, channels, bytes.length.toLong)
    }
  }

  /** Attach a decoded `meta` struct to `binCol`, one partition-batch at a
    * time. Output schema = input ++ meta struct.
    */
  def withDecodedMeta(df: DataFrame, binCol: String): DataFrame = {
    val outSchema = StructType(df.schema.fields :+ StructField("meta", metaSchema))
    val idx = df.schema.fieldIndex(binCol)
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    df.mapPartitions { rows =>
      // per-partition init lives here (codec contexts, buffers, ...)
      rows.map { r =>
        val (fmt, w, h, ch, n) = decodeMeta(r.getAs[Array[Byte]](idx))
        Row.fromSeq(r.toSeq :+ Row(fmt, w, h, ch, n))
      }
    }(enc)
  }

  /** STUB resize — deterministic fake: truncates/pads to w*h bytes. */
  def resizeStub(bytes: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val out = new Array[Byte]((w.toLong * h % (1 << 20)).toInt)
    val n = math.min(bytes.length, out.length)
    System.arraycopy(bytes, 0, out, 0, n)
    out
  }

  /** STUB frame sampler — deterministic fake: splits the payload into
    * `nFrames` contiguous chunks (sizes differ by at most 1 byte, remainder
    * on the leading chunks — same shape a real sampler's frame list has).
    */
  def frameSample(bytes: Array[Byte], nFrames: Int): Seq[Array[Byte]] = {
    val len = bytes.length
    val q = len / nFrames; val rem = len % nFrames
    var off = 0
    (0 until nFrames).map { i =>
      val sz = q + (if (i < rem) 1 else 0)
      val chunk = java.util.Arrays.copyOfRange(bytes, off, off + sz)
      off += sz
      chunk
    }
  }

  /** STUB batched feature extractor — the reference's BERT-batch shape
    * (SURVEY F10): accumulate `batchSize` payloads, make one "model call"
    * per batch, emit a `dim`-long feature vector per item as (j, feat)
    * rows. The fake model is an md5-derived integer recurrence, so the
    * whole pipeline is SQL-replayable by the oracle; a real build swaps
    * the batch body for one ONNX `session.run` over the stacked inputs —
    * the batching, schema and row shape stay as they are.
    */
  def withFeatureRows(
      df: DataFrame, binCol: String, dim: Int, batchSize: Int): DataFrame = {
    val outSchema = StructType(df.schema.fields ++ Seq(
      StructField("j", LongType), StructField("feat", LongType)))
    val idx = df.schema.fieldIndex(binCol)
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        // one "model call" per batch lives here (stacked-input inference)
        val md = java.security.MessageDigest.getInstance("MD5")
        batch.iterator.flatMap { r =>
          val bytes = r.getAs[Array[Byte]](idx)
          md.reset()
          val hex = md.digest(bytes).map("%02x".format(_)).mkString
          val h = java.lang.Long.parseLong(hex.substring(0, 15), 16)
          (0L until dim.toLong).map(j =>
            Row.fromSeq(r.toSeq ++ Seq(j, (h + j * 2654435761L) % 1000003L)))
        }
      }
    }(enc)
  }

  /** 60-bit perceptual hash (aHash shape: threshold a downsampled
    * grayscale raster against its own mean, one bit per cell — the
    * standard image near-dup fingerprint). The DECODE is the stub: the
    * "raster" is 60 code points sampled at evenly spaced positions of
    * the payload text (deterministic and SQL-replayable, the q64/q65
    * fake-decode convention); a codec swap changes only the sampler.
    * Built from `transform`/`aggregate` array expressions so the 60
    * cells stay one codegen'd pass, not 120 inlined substr calls (the
    * minhash codegen-blowup lesson). Requires length(text) ≥ 60
    * upstream (the sampler's last position is 1 + 59n div 60 ≤ n only
    * then). Adds `out` and drops its scratch columns.
    */
  def withPerceptualHash(df: DataFrame, textCol: String, out: String): DataFrame =
    // graft_char_sample is the one-pass native sampler: per-cell
    // substr(text, pos, 1) costs an O(pos) code-point seek per cell
    // (measured ~half of q355's sf1 wall), and pre-splitting the chars
    // allocates an n-element string array per row (measured 3× worse).
    df.withColumn("_pv", expr(s"graft_char_sample($textCol, 60)"))
      .withColumn("_pm", expr("aggregate(_pv, 0L, (a, x) -> a + x) div 60"))
      .withColumn(out, expr(
        """aggregate(sequence(0L, 59L), 0L,
             (a, i) -> a + if(element_at(_pv, cast(i + 1 as int)) > _pm,
                              shiftleft(1L, cast(i as int)), 0L))"""))
      .drop("_pv", "_pm")

  /** 120-bit perceptual hash as two 60-bit words — the CORPUS-SCALED
    * twin of `withPerceptualHash` (q355→q356, the q321→q347 pattern):
    * a fixed 60-bit fingerprint's banded keyspace saturates once
    * n ≈ 2^15 (collision pairs grow n²/B), so production grows the
    * fingerprint with the corpus; doubling to 120 bits widens each of
    * the 4 bands to 30 bits and defers the quadratic regime by 2^15.
    * Same stub sampler at 120 positions; requires length ≥ 120
    * upstream. Adds `out0` (bits 0–59) and `out1` (bits 60–119).
    */
  def withPerceptualHash120(
      df: DataFrame, textCol: String, out0: String, out1: String): DataFrame =
    df.withColumn("_pv", expr(s"graft_char_sample($textCol, 120)"))
      .withColumn("_pm", expr("aggregate(_pv, 0L, (a, x) -> a + x) div 120"))
      .withColumn(out0, expr(
        """aggregate(sequence(0L, 59L), 0L,
             (a, i) -> a + if(element_at(_pv, cast(i + 1 as int)) > _pm,
                              shiftleft(1L, cast(i as int)), 0L))"""))
      .withColumn(out1, expr(
        """aggregate(sequence(60L, 119L), 0L,
             (a, i) -> a + if(element_at(_pv, cast(i + 1 as int)) > _pm,
                              shiftleft(1L, cast(i - 60 as int)), 0L))"""))
      .drop("_pv", "_pm")

  /** Explode each media row into (frame_idx, frame) rows. */
  def withFrames(df: DataFrame, binCol: String, nFrames: Int): DataFrame = {
    val outSchema = StructType(df.schema.fields ++ Seq(
      StructField("frame_idx", IntegerType), StructField("frame", BinaryType)))
    val idx = df.schema.fieldIndex(binCol)
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    df.mapPartitions { rows =>
      rows.flatMap { r =>
        frameSample(r.getAs[Array[Byte]](idx), nFrames).zipWithIndex.map {
          case (chunk, i) => Row.fromSeq(r.toSeq ++ Seq(i, chunk))
        }
      }
    }(enc)
  }
}
