package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media payloads as opaque `BINARY`
  * columns with typed metadata, and a batch feature-extraction pass.
  *
  * The decode step is a clearly-marked STUB (no image/audio codecs ship
  * in this environment): `decodeStub` derives deterministic fake
  * dimensions/features from the payload bytes. Everything around it —
  * the schema, the per-partition batched iteration (the shape a real
  * vectorized decoder needs: amortize model/codec init per partition,
  * process fixed-size batches), partitioning, and column pruning — is
  * real and tested. Swap `decodeStub` for a JNI/ONNX decoder and the
  * pipeline is production-shaped.
  */
object Multimodal {

  case class MediaRow(media_id: String, mime: String, payload: Array[Byte])
  case class MediaFeature(media_id: String, mime: String, byte_len: Int,
                          width: Int, height: Int, embedding: Array[Float])

  /** attach a deterministic pseudo-payload (BINARY) to a media catalog —
    * stands in for reading object-store blobs; length and bytes are pure
    * functions of media_id. */
  def withPayload(media: DataFrame): DataFrame = {
    // payload = repeated xxhash64 hex, length 64..1087 bytes
    val reps = (pmod(xxhash64(col("media_id"), lit(1)), lit(64)) + 4)
      .cast("int")
    media.withColumn("payload",
      unhex(repeat(lower(hex(xxhash64(col("media_id")))), reps)))
  }

  /** ======= STUB ======= deterministic fake decode of one payload.
    * A real implementation would parse the container format and run a
    * decoder here; the signature (bytes in, dims + feature vector out)
    * is the real contract. The fake dimensions are simple modular
    * arithmetic over the byte length so an external oracle can
    * recompute them from the staged payloads (octet_length in SQL). */
  private def decodeStub(mime: String, payload: Array[Byte])
      : (Int, Int, Array[Float]) = {
    val len = payload.length
    val w = 16 + math.floorMod(len * 7919, 1024)
    val ht = 16 + math.floorMod(len * 104729, 1024)
    val emb = Array.tabulate(8)(i =>
      math.floorMod(len * (i + 1) * 131, 1000) / 1000.0f)
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
            val (w, h, emb) = decodeStub(r.mime, r.payload)
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
