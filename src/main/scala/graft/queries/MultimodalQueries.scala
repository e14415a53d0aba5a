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
             |FROM documents""".stripMargin)),

    // ---- M4: media → feature → ANN bridge -------------------------------
    // The stub decoder's feature vector itself goes under the oracle here
    // (md5 → big-endian signed int32 → float division, replayed in SQL),
    // then brute-force cosine top-k runs over those features — media
    // similarity search end-to-end on the multimodal plumbing.
    Q("q_m4_media_ann",
      (s, d) => {
        import graft.operators.Similarity
        val feats = Multimodal.extractFeatures(s,
            Multimodal.fromDocuments(Tables.documents(s, d)),
            Multimodal.DeterministicFakeDecoder, frameBytes = 64, sampleEvery = 4)
          .toDF().select(col("media_id"), col("feature"))
        Similarity.bruteForceTopK(feats, col("media_id") < 3, 5,
          idCol = "media_id", vecCol = "feature")
      },
      Some("""WITH base AS (SELECT doc_id AS media_id, md5(text) AS h FROM documents),
             |ix AS (SELECT media_id, h, unnest(range(1, 5)) AS i FROM base),
             |raws AS (SELECT media_id, i,
             |  CAST('0x' || substr(h, CAST((i - 1) * 8 + 1 AS INT), 8) AS BIGINT) AS raw
             |  FROM ix),
             |fx AS (SELECT media_id, i,
             |  CAST(CAST(CASE WHEN raw >= 2147483648 THEN raw - 4294967296 ELSE raw END AS FLOAT)
             |       / CAST(2147483647 AS FLOAT) AS DOUBLE) AS v
             |  FROM raws),
             |norms AS (SELECT media_id, sqrt(SUM(v * v)) AS nrm FROM fx GROUP BY 1),
             |dots AS (
             |  SELECT q.media_id AS query_id, e.media_id AS neighbor_id,
             |         SUM(q.v * e.v) AS dot
             |  FROM fx q JOIN fx e ON q.i = e.i
             |  WHERE q.media_id < 3 AND e.media_id <> q.media_id
             |  GROUP BY 1, 2),
             |scored AS (
             |  SELECT d.query_id, d.neighbor_id,
             |         ROUND(d.dot / (nq.nrm * nn.nrm), 6) AS score
             |  FROM dots d
             |  JOIN norms nq ON nq.media_id = d.query_id
             |  JOIN norms nn ON nn.media_id = d.neighbor_id)
             |SELECT query_id, neighbor_id, score, rnk FROM (
             |  SELECT *, row_number() OVER (
             |    PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rnk
             |  FROM scored)
             |WHERE rnk <= 5""".stripMargin))
  )
}
