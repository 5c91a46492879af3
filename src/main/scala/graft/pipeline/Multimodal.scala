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
    * is the real contract. */
  private def decodeStub(mime: String, payload: Array[Byte])
      : (Int, Int, Array[Float]) = {
    val h = java.util.Arrays.hashCode(payload)
    val w = 16 + math.floorMod(h, 1024)
    val ht = 16 + math.floorMod(h >> 10, 1024)
    val emb = Array.tabulate(8)(i =>
      (math.floorMod(h * (i + 1), 1000) / 1000.0f))
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
}
