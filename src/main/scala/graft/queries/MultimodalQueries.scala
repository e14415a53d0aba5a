package graft.queries

import org.apache.spark.sql.functions._

import graft.Q
import graft.operators.Multimodal
import graft.sources.Tables

/** Multimodal plumbing surface: binary columns + typed metadata, decoded
  * via the real mapPartitions batch path. The oracle checks the
  * relationally-expressible outputs (lengths, hashes, frame counts);
  * the stub feature vector is covered by ScalaTest instead.
  */
object MultimodalQueries extends graft.QueryPack {

  override def queries: Seq[Q] = Seq(

    // ---- M1: binary staging + metadata (pure column ops) ----------------
    Q("q_m1_binary_meta",
      (s, d) => Multimodal.fromDocuments(Tables.documents(s, d))
        .select(col("media_id"),
          octet_length(col("bytes")).as("byte_len"),
          md5(col("bytes")).as("content_hash"),
          col("meta.mime").as("mime")),
      Some("""SELECT doc_id AS media_id,
             |  octet_length(encode(text)) AS byte_len,
             |  md5(text) AS content_hash,
             |  'application/octet-stream' AS mime
             |FROM documents""".stripMargin)),

    // ---- M3: batch payload transform (stub resize) ----------------------
    Q("q_m3_media_resize",
      (s, d) => Multimodal.transformMedia(s,
          Multimodal.fromDocuments(Tables.documents(s, d)),
          Multimodal.TruncatingFakeResize(16, 8))
        .select(col("media_id"),
          octet_length(col("bytes")).as("new_len"),
          md5(col("bytes")).as("new_hash"),
          col("meta.width").as("w"), col("meta.height").as("h")),
      Some("""SELECT doc_id AS media_id,
             |  octet_length(encode(substr(text, 1, 128))) AS new_len,
             |  md5(substr(text, 1, 128)) AS new_hash,
             |  16 AS w, 8 AS h
             |FROM documents""".stripMargin)),

    // ---- M2: mapPartitions feature extraction (frame split + sampling) --
    Q("q_m2_media_features",
      (s, d) => Multimodal.extractFeatures(s,
          Multimodal.fromDocuments(Tables.documents(s, d)),
          Multimodal.DeterministicFakeDecoder, frameBytes = 64, sampleEvery = 4)
        .toDF()
        .select(col("media_id"), col("byte_len"), col("content_hash"),
          col("n_frames"), col("n_sampled")),
      Some("""SELECT doc_id AS media_id,
             |  CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
             |  md5(text) AS content_hash,
             |  (octet_length(encode(text)) + 63) // 64 AS n_frames,
             |  ((octet_length(encode(text)) + 63) // 64 + 3) // 4 AS n_sampled
             |FROM documents""".stripMargin))
  )
}
