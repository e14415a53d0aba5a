package graft.queries

import org.apache.spark.sql.functions._

import graft.Q
import graft.operators.Multimodal
import graft.sources.Tables

/** Multimodal surface: binary columns + typed metadata, REAL JDK image
  * codec (`javax.imageio`) decode/resize inside the mapPartitions batch
  * path. The image fixtures are synthesized PNGs whose pixels follow a
  * closed form over (media_id, pixel index), so the oracles replay every
  * pixel-derived feature relationally — a decode bug (wrong channel
  * order, row stride, sample position) breaks the hash. Encoded-byte
  * facts (PNG length/hash) are codec-owned and spec-covered instead.
  */
object MultimodalQueries extends graft.QueryPack {

  /** Closed-form channel sums over the synthesized `W × H` fixture,
    * optionally through the nearest-neighbor index map of a resize —
    * ends with `ch AS (media_id, sr, sg, sb)` plus `n` pixels summed. */
  private def duckChannelSums(nPix: Int, sidx: String): String =
    s"""g AS (SELECT doc_id AS media_id, unnest(range(0, $nPix)) AS j FROM documents),
       |m AS (SELECT media_id, $sidx AS sidx FROM g),
       |ch AS (SELECT media_id,
       |  SUM((media_id + sidx) % 256) AS sr,
       |  SUM((media_id * 3 + sidx * 5 + 17) % 256) AS sg,
       |  SUM((media_id * 7 + sidx * 11 + 41) % 256) AS sb
       |FROM m GROUP BY 1)""".stripMargin

  /** `[w, h, meanR, meanG, meanB]` as DOUBLEs of the decoder's FLOATs:
    * integer channel sums divided in double then narrowed to float —
    * the exact arithmetic [[Multimodal.ImageIoDecoder]] runs. */
  private def duckFeature(w: Int, h: Int, n: Int): Seq[String] = Seq(
    s"CAST(CAST($w AS FLOAT) AS DOUBLE)",
    s"CAST(CAST($h AS FLOAT) AS DOUBLE)",
    s"CAST(CAST(CAST(sr AS DOUBLE) / $n AS FLOAT) AS DOUBLE)",
    s"CAST(CAST(CAST(sg AS DOUBLE) / $n AS FLOAT) AS DOUBLE)",
    s"CAST(CAST(CAST(sb AS DOUBLE) / $n AS FLOAT) AS DOUBLE)")

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

    // ---- M2: REAL PNG decode -> pixel features (16x8 fixture) -----------
    // The oracle never sees a PNG: it recomputes the channel means from
    // the closed-form pixels. Equality proves ImageIO decode + the
    // feature pass read exactly the pixels the encoder wrote.
    Q("q_m2_media_features",
      (s, d) => Multimodal.extractFeatures(s,
          Multimodal.synthesizeImages(s,
            Tables.documents(s, d).select(col("doc_id")), 16, 8,
            idCol = "doc_id"),
          Multimodal.ImageIoDecoder, frameBytes = 64, sampleEvery = 4)
        .toDF()
        .select(col("media_id"),
          element_at(col("feature"), 1).cast("double").as("img_w"),
          element_at(col("feature"), 2).cast("double").as("img_h"),
          element_at(col("feature"), 3).cast("double").as("mean_r"),
          element_at(col("feature"), 4).cast("double").as("mean_g"),
          element_at(col("feature"), 5).cast("double").as("mean_b")),
      Some(s"""WITH ${duckChannelSums(128, "j")}
              |SELECT media_id,
              |  ${duckFeature(16, 8, 128).zip(
                   Seq("img_w", "img_h", "mean_r", "mean_g", "mean_b"))
                   .map { case (e, a) => s"$e AS $a" }.mkString(",\n              |  ")}
              |FROM ch""".stripMargin)),

    // ---- M3: REAL decode -> nearest-neighbor resize -> decode again -----
    // 16x8 -> 7x3 (non-divisible on purpose: the sample map floor(x*16/7)
    // is exercised at every coordinate). The oracle replays the index map
    // and the resized image's channel means.
    Q("q_m3_media_resize",
      (s, d) => Multimodal.extractFeatures(s,
          Multimodal.transformMedia(s,
            Multimodal.synthesizeImages(s,
              Tables.documents(s, d).select(col("doc_id")), 16, 8,
              idCol = "doc_id"),
            Multimodal.ImageResize(7, 3)),
          Multimodal.ImageIoDecoder, frameBytes = 64, sampleEvery = 4)
        .toDF()
        .select(col("media_id"),
          element_at(col("feature"), 1).cast("double").as("img_w"),
          element_at(col("feature"), 2).cast("double").as("img_h"),
          element_at(col("feature"), 3).cast("double").as("mean_r"),
          element_at(col("feature"), 4).cast("double").as("mean_g"),
          element_at(col("feature"), 5).cast("double").as("mean_b")),
      Some(s"""WITH ${duckChannelSums(21,
                 "((j // 7) * 8 // 3) * 16 + ((j % 7) * 16 // 7)")}
              |SELECT media_id,
              |  ${duckFeature(7, 3, 21).zip(
                   Seq("img_w", "img_h", "mean_r", "mean_g", "mean_b"))
                   .map { case (e, a) => s"$e AS $a" }.mkString(",\n              |  ")}
              |FROM ch""".stripMargin)),

    // ---- M5: frame accounting over opaque payloads (no decode) ----------
    // The audio/video chunking shape: fixed-size frames + every-k
    // sampling over bytes the pipeline ships but never interprets.
    Q("q_m5_frame_stats",
      (s, d) => Multimodal.frameStats(s,
          Multimodal.fromDocuments(Tables.documents(s, d)),
          frameBytes = 64, sampleEvery = 4),
      Some("""SELECT doc_id AS media_id,
             |  CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
             |  md5(text) AS content_hash,
             |  (octet_length(encode(text)) + 63) // 64 AS n_frames,
             |  ((octet_length(encode(text)) + 63) // 64 + 3) // 4 AS n_sampled
             |FROM documents""".stripMargin)),

    // ---- M6: REAL WAV decode -> signal features -------------------------
    // The audio modality made real the same way as the image one: PCM
    // samples come from a closed form, the engine round-trips them
    // through the JDK's actual RIFF/WAVE codec (javax.sound.sampled),
    // and the oracle recomputes peak / strict-sign zero crossings / rms
    // from the formula — it never sees a WAV byte. Equality proves the
    // container write+parse read exactly the samples the encoder wrote.
    Q("q_m6_audio_features",
      (s, d) => Multimodal.audioFeatures(s,
        Multimodal.synthesizeAudio(s,
          Tables.documents(s, d).select(col("doc_id")), nSamples = 160,
          sampleRate = 8000, idCol = "doc_id")),
      Some("""WITH smp AS (
             |  SELECT doc_id AS media_id, i,
             |    ((doc_id * 31 + i * 17) % 2000) - 1000 AS v
             |  FROM documents, (SELECT unnest(range(0, 160)) AS i)),
             |p AS (
             |  SELECT media_id, v,
             |    lag(v) OVER (PARTITION BY media_id ORDER BY i) AS pv
             |  FROM smp)
             |SELECT media_id,
             |  160 AS n_samples, 8000 AS sample_rate,
             |  MAX(ABS(v)) AS peak,
             |  COUNT(CASE WHEN pv * v < 0 THEN 1 END) AS zero_crossings,
             |  ROUND(sqrt(SUM(CAST(v AS DOUBLE) * v) / 160), 6) AS rms
             |FROM p GROUP BY 1""".stripMargin)),

    // ---- M7: REAL per-frame video decode -> temporal features -----------
    // The video-pipeline shape end-to-end: container parse (GVID — a
    // documented length-prefixed PNG-frame container; the JDK ships no
    // demuxer) → every-4th frame sample → per-frame ImageIO decode →
    // exact-integer channel sums + frame-to-frame motion. The oracle
    // replays the sampled frames' pixels from the closed form (frame f,
    // pixel i ⇒ flat index f·128+i) and never sees a container byte.
    Q("q_m7_video_features",
      (s, d) => Multimodal.videoFeatures(s,
        Multimodal.synthesizeVideos(s,
          Tables.documents(s, d).select(col("doc_id")), 16, 8,
          nFrames = 6, idCol = "doc_id"),
        sampleEvery = 4),
      Some("""WITH px AS (
             |  SELECT doc_id AS media_id, f,
             |    (doc_id + f*128 + i) % 256 AS r,
             |    (doc_id*3 + (f*128 + i)*5 + 17) % 256 AS g,
             |    (doc_id*7 + (f*128 + i)*11 + 41) % 256 AS b
             |  FROM documents,
             |    (SELECT unnest([0, 4]) AS f),
             |    (SELECT unnest(range(0, 128)) AS i)),
             |fs AS (
             |  SELECT media_id, f, CAST(SUM(r) AS BIGINT) AS fr,
             |    CAST(SUM(g) AS BIGINT) AS fg, CAST(SUM(b) AS BIGINT) AS fb
             |  FROM px GROUP BY 1, 2),
             |lagged AS (
             |  SELECT *, lag(fr) OVER (PARTITION BY media_id ORDER BY f) AS pf
             |  FROM fs)
             |SELECT media_id, CAST(6 AS BIGINT) AS n_frames,
             |  CAST(2 AS BIGINT) AS n_sampled,
             |  CAST(SUM(fr) AS BIGINT) AS sum_r,
             |  CAST(SUM(fg) AS BIGINT) AS sum_g,
             |  CAST(SUM(fb) AS BIGINT) AS sum_b,
             |  CAST(SUM(CASE WHEN pf IS NOT NULL THEN ABS(fr - pf)
             |    ELSE 0 END) AS BIGINT) AS motion_r
             |FROM lagged GROUP BY 1""".stripMargin)),

    // ---- M4: media -> REAL pixel features -> ANN bridge -----------------
    // Brute-force cosine top-k over the decoded feature vectors — media
    // similarity search end-to-end on the multimodal plumbing, every
    // number from real decoded pixels.
    Q("q_m4_media_ann",
      (s, d) => {
        import graft.operators.Similarity
        val feats = Multimodal.extractFeatures(s,
            Multimodal.synthesizeImages(s,
              Tables.documents(s, d).select(col("doc_id")), 16, 8,
              idCol = "doc_id"),
            Multimodal.ImageIoDecoder, frameBytes = 64, sampleEvery = 4)
          .toDF().select(col("media_id"), col("feature"))
        Similarity.bruteForceTopK(feats, col("media_id") < 3, 5,
          idCol = "media_id", vecCol = "feature")
      },
      Some(s"""WITH ${duckChannelSums(128, "j")},
              |fx AS (
              |  ${duckFeature(16, 8, 128).zipWithIndex.map { case (e, i) =>
                   s"SELECT media_id, ${i + 1} AS i, $e AS v FROM ch"
                 }.mkString("\n              |  UNION ALL ")}),
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
