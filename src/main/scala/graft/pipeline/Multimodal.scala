package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media payloads as opaque `BINARY`
  * columns with typed metadata, and a batch feature-extraction pass.
  *
  * PNG decode is REAL (`javax.imageio` ships in the JDK): payloads for
  * `image/png` rows are genuine encoded PNGs and feature extraction
  * parses actual width/height/pixels. The decode result is
  * independently verifiable: PNG stores dimensions at fixed IHDR byte
  * offsets, so an external SQL oracle re-derives them STRUCTURALLY from
  * the raw bytes — no shared code with the ImageIO path. JPEG / audio /
  * video decode remain clearly-marked STUBs (no further codecs ship in
  * this environment): `decodeStub` derives deterministic fake
  * dimensions/features from the payload bytes. Everything around the
  * stubs — schema, per-partition batched iteration (the shape a real
  * vectorized decoder needs: amortize codec/model init per partition,
  * process fixed-size batches), partitioning, column pruning — is real
  * and tested; swap `decodeStub` for a JNI/ONNX decoder and the
  * pipeline is production-shaped.
  */
object Multimodal {

  case class MediaRow(media_id: String, mime: String, payload: Array[Byte])
  case class PayloadRow(media_id: String, mime: String, bytes: Long,
                        payload: Array[Byte])
  case class MediaFeature(media_id: String, mime: String, byte_len: Int,
                          width: Int, height: Int, embedding: Array[Float])

  /** deterministic tiny real PNG for a media id: dimensions and pixel
    * gradient are pure functions of the id (String.hashCode is
    * spec-stable), encoded with the JDK's ImageIO PNG writer. */
  private[pipeline] def pngPayload(mediaId: String): Array[Byte] = {
    val h0 = mediaId.hashCode
    val w = 1 + math.floorMod(h0, 48)
    val ht = 1 + math.floorMod(h0 >> 8, 48)
    val img = new java.awt.image.BufferedImage(w, ht,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < ht) {
      var x = 0
      while (x < w) {
        img.setRGB(x, y, (h0 * 31 + x * 7 + y * 131) & 0xffffff)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** attach a deterministic payload (BINARY) to a media catalog —
    * stands in for reading object-store blobs. `image/png` rows carry a
    * REAL encoded PNG ([[pngPayload]]); other mimes a pseudo-payload of
    * repeated hash hex, both pure functions of media_id. */
  def withPayload(media: DataFrame): DataFrame = {
    // stub payload = repeated xxhash64 hex, length 64..1087 bytes
    val reps = (pmod(xxhash64(col("media_id"), lit(1)), lit(64)) + 4)
      .cast("int")
    val base = media.select(col("media_id"), col("mime"),
      col("bytes").cast("long").as("bytes"),
      unhex(repeat(lower(hex(xxhash64(col("media_id")))), reps))
        .as("payload"))
    implicit val enc = Encoders.product[PayloadRow]
    base.as[PayloadRow].mapPartitions(_.map { r =>
      if (r.mime == "image/png") r.copy(payload = pngPayload(r.media_id))
      else r
    }).toDF()
  }

  /** ======= STUB ======= deterministic fake decode of one payload
    * (every mime except image/png — see [[decodePng]]). A real
    * implementation would parse the container format and run a decoder
    * here; the signature (bytes in, dims + feature vector out) is the
    * real contract. The fake dimensions are simple modular arithmetic
    * over the byte length so an external oracle can recompute them from
    * the staged payloads (octet_length in SQL). */
  private def decodeStub(mime: String, payload: Array[Byte])
      : (Int, Int, Array[Float]) = {
    val len = payload.length
    val w = 16 + math.floorMod(len * 7919, 1024)
    val ht = 16 + math.floorMod(len * 104729, 1024)
    val emb = Array.tabulate(8)(i =>
      math.floorMod(len * (i + 1) * 131, 1000) / 1000.0f)
    (w, ht, emb)
  }

  /** REAL decode: ImageIO PNG → actual dimensions plus an 8-dim pixel
    * feature (mean/max per RGB channel + normalized geometry) — the
    * genuine decode-then-featurize contract. Deterministic: pixel
    * traversal is row-major, accumulation in double. */
  private def decodePng(payload: Array[Byte]): (Int, Int, Array[Float]) = {
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(payload))
    if (img == null) return decodeStub("image/png", payload) // corrupt
    val w = img.getWidth; val ht = img.getHeight
    val sums = new Array[Double](3); val maxs = new Array[Int](3)
    var y = 0
    while (y < ht) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val cs = Array((rgb >> 16) & 0xff, (rgb >> 8) & 0xff, rgb & 0xff)
        var c = 0
        while (c < 3) {
          sums(c) += cs(c); if (cs(c) > maxs(c)) maxs(c) = cs(c); c += 1
        }
        x += 1
      }
      y += 1
    }
    val n = (w * ht).toDouble
    val emb = Array(
      (sums(0) / n / 255.0).toFloat, (sums(1) / n / 255.0).toFloat,
      (sums(2) / n / 255.0).toFloat,
      maxs(0) / 255.0f, maxs(1) / 255.0f, maxs(2) / 255.0f,
      w / 64.0f, ht / 64.0f)
    (w, ht, emb)
  }

  /** batched per-partition feature extraction. `batchSize` models the
    * vectorized-decoder batch shape; partition iteration order is the
    * input order (deterministic given deterministic input). */
  def extractFeatures(media: DataFrame, batchSize: Int = 64)
      : Dataset[MediaFeature] = {
    val spark = media.sparkSession
    implicit val enc = Encoders.product[MediaFeature]
    implicit val encIn = Encoders.product[MediaRow]
    media.select(col("media_id"), col("mime"), col("payload"))
      .as[MediaRow]
      .mapPartitions { it =>
        // per-partition init happens HERE in a real decoder (codec/model)
        it.grouped(batchSize).flatMap { batch =>
          batch.map { r =>
            val (w, h, emb) =
              if (r.mime == "image/png") decodePng(r.payload)
              else decodeStub(r.mime, r.payload)
            MediaFeature(r.media_id, r.mime, r.payload.length, w, h, emb)
          }
        }
      }
  }

  case class ResizedMedia(media_id: String, mime: String, width: Int,
                          height: Int, payload: Array[Byte])

  /** ======= STUB ======= resize stage: computes the letterboxed target
    * geometry (real logic) and fakes the pixel resample by truncating /
    * repeating payload bytes deterministically (a real impl swaps in the
    * codec). Aspect-ratio math and schema are the production contract. */
  def resize(features: Dataset[MediaFeature], maxSide: Int = 256)
      : Dataset[ResizedMedia] = {
    implicit val enc = Encoders.product[ResizedMedia]
    features.map { f =>
      val scale = math.min(1.0, maxSide.toDouble / math.max(f.width,
        f.height))
      val (w, h) = (math.max(1, (f.width * scale).toInt),
        math.max(1, (f.height * scale).toInt))
      val targetLen = math.max(4, (f.byte_len * scale * scale).toInt)
      // STUB resample: deterministic byte pattern of the target size
      val payload = Array.tabulate(math.min(targetLen, 4096))(i =>
        ((f.media_id.hashCode + i * 31) & 0xff).toByte)
      ResizedMedia(f.media_id, f.mime, w, h, payload)
    }
  }

  case class Frame(media_id: String, frame_idx: Int, pts_ms: Long,
                   feature: Array[Float])

  /** ======= STUB ======= frame sampling for video payloads: one row per
    * sampled frame at `everyMs` spacing over a fake duration derived
    * from payload length (a real impl demuxes the container). The
    * one-to-many explode shape, deterministic pts, and per-frame feature
    * plumbing are the production contract. */
  def sampleFrames(media: DataFrame, everyMs: Long = 1000)
      : Dataset[Frame] = {
    implicit val enc = Encoders.product[Frame]
    implicit val encIn = Encoders.product[MediaRow]
    media.select(col("media_id"), col("mime"), col("payload"))
      .where(col("mime").startsWith("video/"))
      .as[MediaRow]
      .flatMap { r =>
        val durationMs = 500L + (math.abs(
          java.util.Arrays.hashCode(r.payload)) % 10000)
        (0L until durationMs by everyMs).zipWithIndex.map {
          case (pts, idx) =>
            val h = java.util.Arrays.hashCode(r.payload) ^ pts.toInt
            Frame(r.media_id, idx, pts, Array.tabulate(4)(i =>
              math.floorMod(h * (i + 1), 1000) / 1000.0f))
        }
      }
  }
}
