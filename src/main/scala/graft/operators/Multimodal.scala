package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for LLM-data pipelines: image/audio/video
  * payloads ride as opaque `binary` columns with typed metadata structs;
  * decode / feature-extraction runs batch-at-a-time inside mapPartitions
  * (the JVM analogue of arrow-batched UDFs) so per-partition setup — a
  * decoder context, a model session — happens once per task, not per row.
  *
  * The decode step itself is a clearly-marked STUB: no image/audio codecs
  * exist in this environment, so [[DeterministicFakeDecoder]] derives a
  * pseudo-feature from the content hash. Everything around it — schema,
  * encoders, partitioning, batch iteration, frame sampling — is the real
  * distributed shape and is oracle-tested.
  */
object Multimodal {

  final case class MediaMeta(mime: String, width: Int, height: Int)
  final case class MediaRecord(media_id: Long, bytes: Array[Byte], meta: MediaMeta)
  final case class MediaFeatures(
      media_id: Long,
      byte_len: Long,
      content_hash: String,
      n_frames: Long,
      n_sampled: Long,
      feature: Array[Float])

  /** Pluggable decode/feature step, instantiated once per partition. */
  trait MediaDecoder extends Serializable {
    def decode(bytes: Array[Byte], meta: MediaMeta): Array[Float]
  }

  /** STUB decoder — a real deployment would wrap an image/audio codec
    * here; this one folds the md5 digest into 4 floats deterministically
    * so tests and oracles stay exact. */
  object DeterministicFakeDecoder extends MediaDecoder {
    override def decode(bytes: Array[Byte], meta: MediaMeta): Array[Float] = {
      val d = java.security.MessageDigest.getInstance("MD5").digest(bytes)
      (0 until 4).map(i =>
        java.nio.ByteBuffer.wrap(d, i * 4, 4).getInt.toFloat / Int.MaxValue).toArray
    }
  }

  /** Stage a media table out of `documents` (text bytes stand in for an
    * encoded payload; the schema is the real multimodal shape). */
  def fromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      col("text").cast("binary").as("bytes"),
      struct(lit("application/octet-stream").as("mime"),
        lit(0).as("width"), lit(0).as("height")).as("meta"))

  /** Pluggable payload transform (resize, transcode, crop), instantiated
    * once per partition like [[MediaDecoder]]. */
  trait MediaTransform extends Serializable {
    def apply(bytes: Array[Byte], meta: MediaMeta): (Array[Byte], MediaMeta)
  }

  /** STUB resize — a real deployment wraps an image library here; this
    * one truncates the payload to `w*h` CHARACTERS (the payloads staged by
    * [[fromDocuments]] are UTF-8 text, and the oracle expresses the
    * truncation as `substr(text, 1, w*h)`, which counts characters — a
    * byte-based `take` would diverge on any multibyte character) and
    * stamps the new dimensions. A real resize operates on decoded pixels,
    * where the byte/char distinction doesn't exist. */
  final case class TruncatingFakeResize(w: Int, h: Int) extends MediaTransform {
    override def apply(bytes: Array[Byte], meta: MediaMeta): (Array[Byte], MediaMeta) = {
      // codepoint-counted, not String.take (UTF-16 code units), so
      // astral-plane characters count as one — matching SQL substr
      val s = new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
      val n = math.min(w * h, s.codePointCount(0, s.length))
      val truncated = s.substring(0, s.offsetByCodePoints(0, n))
        .getBytes(java.nio.charset.StandardCharsets.UTF_8)
      (truncated, MediaMeta(meta.mime, w, h))
    }
  }

  /** Batch payload transform inside one mapPartitions pass — the resize /
    * transcode stage of a media pipeline; schema in == schema out, so
    * transforms compose and the sink sees the same multimodal shape. */
  def transformMedia(spark: SparkSession, media: DataFrame,
      t: MediaTransform): DataFrame = {
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { it =>
      it.map { rec =>
        val (b2, m2) = t(rec.bytes, rec.meta)
        MediaRecord(rec.media_id, b2, m2)
      }
    }.toDF()
  }

  /** Batch feature extraction: fixed-size frame split + every-k sampling
    * + per-frame-batch decode, all inside one mapPartitions pass. */
  def extractFeatures(spark: SparkSession, media: DataFrame,
      decoder: MediaDecoder, frameBytes: Int, sampleEvery: Int): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { it =>
      // per-partition setup happens HERE (decoder context, buffers)
      val md = java.security.MessageDigest.getInstance("MD5")
      it.map { rec =>
        val len = rec.bytes.length.toLong
        val nFrames = (len + frameBytes - 1) / frameBytes
        val sampled = rec.bytes.grouped(frameBytes).zipWithIndex
          .filter(_._2 % sampleEvery == 0).map(_._1).toArray
        md.reset()
        val hash = md.digest(rec.bytes).map("%02x".format(_)).mkString
        MediaFeatures(rec.media_id, len, hash, nFrames, sampled.length.toLong,
          decoder.decode(rec.bytes, rec.meta))
      }
    }
  }
}
