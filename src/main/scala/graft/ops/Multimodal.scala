package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One media object: opaque binary payload + typed metadata. */
final case class MediaRow(
    doc_id: Long,
    media_type: String, // "image" | "audio"
    width: Int, // image: pixels; audio: sample rate
    height: Int, // image: pixels; audio: channels
    format: String,
    payload: Array[Byte])

/** Extracted features for one media object. */
final case class MediaFeatures(
    doc_id: Long,
    media_type: String,
    n_bytes: Int,
    checksum: Long,
    features: Array[Float]) // fixed FeatureDim-length embedding

/** Multimodal-column plumbing: treat image/audio as opaque `binary` columns
  * with typed metadata, process them batch-at-a-time per partition.
  *
  * The actual codec (JPEG decode, resampling, a vision encoder) is NOT in
  * this container, so `decodeStub` is a clearly-marked deterministic fake;
  * everything AROUND it — schema, binary payload handling, partition-sized
  * batching, feature-vector shape, the narrow `mapPartitions` execution
  * (the Scala analogue of `mapInPandas`: one buffer-reuse loop per
  * partition, amortizing per-batch model setup) — is real and tested.
  * Swapping `decodeStub` for a JNI/ONNX call is the only production delta.
  */
object Multimodal {

  val FeatureDim = 16

  /** Deterministic synthetic media derived from doc_id (no external data):
    * payload bytes are a splitmix64 stream, sized by media type.
    */
  def synthesize(spark: SparkSession, docs: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(col("doc_id"), col("n_chars")).as[(Long, Long)].map { case (id, nc) =>
      val mt = if (id % 3 == 0) "audio" else "image"
      val len = 64 + (nc % 192).toInt
      val bytes = new Array[Byte](len)
      var h = graft.fixtures.TranscriptGen.mix(id)
      var i = 0
      while (i < len) {
        if (i % 8 == 0) h = graft.fixtures.TranscriptGen.mix(h + i)
        bytes(i) = (h >>> ((i % 8) * 8)).toByte
        i += 1
      }
      if (mt == "image") MediaRow(id, mt, 32 + (id % 32).toInt, 32, "fakepng", bytes)
      else MediaRow(id, mt, 16000, 1, "fakewav", bytes)
    }
  }

  /** STUB decoder ("???"-equivalent): a real implementation would JPEG-
    * decode / resample `payload`; this fake derives FeatureDim floats
    * deterministically from the bytes so tests can pin shape + values.
    */
  private[ops] def decodeStub(payload: Array[Byte]): Array[Float] = {
    val out = new Array[Float](FeatureDim)
    var i = 0
    while (i < payload.length) {
      out(i % FeatureDim) += (payload(i) & 0xff) / 255.0f
      i += 1
    }
    out
  }

  /** Feature extraction as a narrow per-partition batch loop — no shuffle;
    * at 100 TB this is scan + CPU, scaling with executors. Batches of
    * `batchSize` model the GPU/encoder batch shape a real decoder needs.
    */
  def extractFeatures(spark: SparkSession, media: Dataset[MediaRow],
      batchSize: Int = 64): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // per-batch setup happens HERE (e.g. encoder session reuse)
        batch.iterator.map { m =>
          var ck = 0L
          var i = 0
          while (i < m.payload.length) { ck = ck * 31 + (m.payload(i) & 0xff); i += 1 }
          MediaFeatures(m.doc_id, m.media_type, m.payload.length, ck,
            decodeStub(m.payload))
        }
      }
    }
  }
}
