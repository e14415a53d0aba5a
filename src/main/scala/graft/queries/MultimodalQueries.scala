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

  /** Closed-form aHash relation `name(media_id, ahash)` over the 16x8
    * fixture sampled on the 8x4 grid (sidx = 32·(j div 8) + 2·(j mod 8) —
    * the ImageResize NN map). `pertR = true` replays [[Multimodal
    * .PixelShift]](1, 128): the variant's R channel at sidx 0 is shifted
    * by 128 mod 256 (the 2x NN downscale keeps pixel 0, and aHash is
    * invariant under the downscale itself). */
  private def duckAHashRel(name: String, pertR: Boolean): String = {
    val rShift = if (pertR) " + CASE WHEN sidx = 0 THEN 128 ELSE 0 END" else ""
    s"""${name}_g AS (
       |  SELECT media_id, j, gray,
       |    SUM(gray) OVER (PARTITION BY media_id) AS tot
       |  FROM (
       |    SELECT doc_id AS media_id, j,
       |      (doc_id + sidx$rShift) % 256
       |      + (doc_id * 3 + sidx * 5 + 17) % 256
       |      + (doc_id * 7 + sidx * 11 + 41) % 256 AS gray
       |    FROM (SELECT doc_id, j, 32 * (j // 8) + 2 * (j % 8) AS sidx
       |          FROM documents, (SELECT unnest(range(0, 32)) AS j)))),
       |$name AS (
       |  SELECT media_id,
       |    CAST(SUM(CASE WHEN gray * 32 > tot
       |      THEN (CAST(1 AS BIGINT) << j) ELSE 0 END) AS BIGINT) AS ahash
       |  FROM ${name}_g GROUP BY 1)""".stripMargin
  }

  /** Closed-form audio fingerprint relation `name(media_id, ahash)` over
    * the 160-sample fixture: 32 segments of 5 samples (`seg = i·32 div
    * 160`), exact-integer segment energies Σv², bit j = energy·4 > its
    * 4-segment window total (strict — [[Multimodal.audioFingerprint]]'s
    * threshold). `shifted = true` replays [[Multimodal.SampleShift]]
    * (5, 700): the first 5 samples (exactly segment 0) shift by 700
    * wrapping in 16-bit space. */
  private def duckAudioFpRel(name: String, shifted: Boolean): String = {
    val base = "((doc_id*31 + i*17) % 2000) - 1000"
    val vexpr = if (shifted)
      s"CASE WHEN i < 5 THEN ((($base) + 700 + 32768) % 65536) - 32768 " +
        s"ELSE $base END"
    else base
    s"""${name}_e AS (
       |  SELECT media_id, (i * 32) // 160 AS s,
       |    SUM(CAST(v AS BIGINT) * v) AS e
       |  FROM (SELECT doc_id AS media_id, i, $vexpr AS v
       |        FROM documents, (SELECT unnest(range(0, 160)) AS i))
       |  GROUP BY 1, 2),
       |${name}_w AS (
       |  SELECT media_id, s, e,
       |    SUM(e) OVER (PARTITION BY media_id, s // 4) AS tot
       |  FROM ${name}_e),
       |$name AS (
       |  SELECT media_id, CAST(SUM(CASE WHEN e * 4 > tot
       |    THEN (CAST(1 AS BIGINT) << s) ELSE 0 END) AS BIGINT) AS ahash
       |  FROM ${name}_w GROUP BY 1)""".stripMargin
  }

  /** Closed-form video fingerprint relation `name(media_id, ahash)` over
    * the 16×8 × 6-frame fixture, frames 0 and 4 sampled (every-4th, max
    * 2), 4×4 grid per frame (`sidx = 32·(j div 4) + 4·(j mod 4)`, flat
    * pixel index `f·128 + sidx`), strict per-frame mean threshold, frame
    * sample s's bits at `s·16 + j`. `pertR = true` replays
    * [[Multimodal.FramePixelShift]](0, 1, 128): frame 0's pixel 0 (grid
    * cell j = 0 of sample 0) gets its R channel shifted by 128 mod
    * 256. */
  private def duckVideoFpRel(name: String, pertR: Boolean): String = {
    val rShift =
      if (pertR) " + CASE WHEN s = 0 AND j = 0 THEN 128 ELSE 0 END" else ""
    s"""${name}_g AS (
       |  SELECT media_id, s, j, gray,
       |    SUM(gray) OVER (PARTITION BY media_id, s) AS tot
       |  FROM (
       |    SELECT doc_id AS media_id, s, j,
       |      (doc_id + flat$rShift) % 256
       |      + (doc_id * 3 + flat * 5 + 17) % 256
       |      + (doc_id * 7 + flat * 11 + 41) % 256 AS gray
       |    FROM (SELECT doc_id, s, j,
       |            (s * 4) * 128 + 32 * (j // 4) + 4 * (j % 4) AS flat
       |          FROM documents,
       |            (SELECT unnest([0, 1]) AS s),
       |            (SELECT unnest(range(0, 16)) AS j)))),
       |$name AS (
       |  SELECT media_id,
       |    CAST(SUM(CASE WHEN gray * 16 > tot
       |      THEN (CAST(1 AS BIGINT) << (s * 16 + j)) ELSE 0 END)
       |      AS BIGINT) AS ahash
       |  FROM ${name}_g GROUP BY 1)""".stripMargin
  }

  override def queries: Seq[Q] = Seq(

    // ---- M23: video scene-cut detection -----------------------------------
    // Shot boundaries over the per-frame aHash relation (all 6 frames,
    // 4x4 grid) at tau = 6 bits — the sampling-plan input a video
    // pipeline derives before frame extraction. The oracle replays the
    // closed-form per-frame hashes and the consecutive-frame hamming.
    Q("q_m23_scene_cuts",
      (s, d) => Multimodal.videoSceneCuts(
        Multimodal.videoFrameHashes(s,
          Multimodal.synthesizeVideos(s,
            Tables.documents(s, d).select(col("doc_id")), 16, 8,
            nFrames = 6, idCol = "doc_id"), 4, 4), tauBits = 6),
      Some("""WITH g AS (
             |  SELECT doc_id AS media_id, f, j,
             |    (doc_id + flat) % 256
             |    + (doc_id * 3 + flat * 5 + 17) % 256
             |    + (doc_id * 7 + flat * 11 + 41) % 256 AS gray
             |  FROM (SELECT doc_id, f, j,
             |          f * 128 + 32 * (j // 4) + 4 * (j % 4) AS flat
             |        FROM documents,
             |          (SELECT unnest(range(0, 6)) AS f),
             |          (SELECT unnest(range(0, 16)) AS j))),
             |fh AS (SELECT media_id, f,
             |    CAST(SUM(CASE WHEN gray * 16 > tot
             |      THEN (CAST(1 AS BIGINT) << j) ELSE 0 END)
             |      AS BIGINT) AS fhash
             |  FROM (SELECT *, SUM(gray) OVER (PARTITION BY media_id, f)
             |      AS tot FROM g)
             |  GROUP BY 1, 2),
             |jm AS (SELECT a.media_id,
             |    bit_count(xor(a.fhash, b.fhash)) AS jump
             |  FROM fh a JOIN fh b ON b.media_id = a.media_id
             |    AND b.f = a.f - 1)
             |SELECT m.media_id, m.n_frames,
             |  COALESCE(c.n_cuts, 0) AS n_cuts, c.max_jump
             |FROM (SELECT media_id, CAST(COUNT(*) AS BIGINT) AS n_frames
             |  FROM fh GROUP BY 1) m
             |LEFT JOIN (SELECT media_id,
             |    CAST(COUNT(CASE WHEN jump >= 6 THEN 1 END) AS BIGINT)
             |      AS n_cuts,
             |    CAST(MAX(jump) AS BIGINT) AS max_jump
             |  FROM jm GROUP BY 1) c USING (media_id)""".stripMargin)),

    // ---- M22: MMC4 interleaved image placement ----------------------------
    // Pages synthesized from embeddings: vec_id div 8 = the document,
    // its six chunk vectors (vec_id % 8 in 0..5, chunk_id = the
    // position ordinal) and two image vectors (vec_id % 8 in 6..7).
    // Each image attaches to its OWN document's max-cosine chunk — the
    // join is keyed by doc, never corpus-wide. The oracle replays the
    // within-doc 6-dp micro cosine and the (score desc, chunk asc)
    // argmax.
    Q("q_m22_interleave_assign",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        Multimodal.interleaveAssign(
          emb.filter(col("vec_id") % 8 >= 6)
            .select(expr("vec_id div 8").as("doc_id"),
              col("vec_id").as("img_id"), col("embedding").as("img_vec")),
          emb.filter(col("vec_id") % 8 < 6)
            .select(expr("vec_id div 8").as("doc_id"),
              (col("vec_id") % 8).as("chunk_id"),
              col("embedding").as("chunk_vec")))
      },
      Some("""WITH ex AS (SELECT vec_id, unnest(embedding) AS v,
             |    unnest(range(1, len(embedding) + 1)) AS i
             |  FROM embeddings),
             |norms AS (SELECT vec_id,
             |    sqrt(SUM(CAST(v AS DOUBLE) * CAST(v AS DOUBLE))) AS nrm
             |  FROM ex GROUP BY 1),
             |ch AS (SELECT vec_id // 8 AS doc_id, vec_id % 8 AS chunk_id,
             |    vec_id FROM embeddings WHERE vec_id % 8 < 6),
             |im AS (SELECT vec_id // 8 AS doc_id, vec_id AS img_id,
             |    vec_id FROM embeddings WHERE vec_id % 8 >= 6),
             |nc AS (SELECT ch.doc_id, CAST(COUNT(*) AS BIGINT) AS n_chunks
             |  FROM ch JOIN norms n ON n.vec_id = ch.vec_id
             |  WHERE n.nrm > 0 GROUP BY 1),
             |dots AS (SELECT im.doc_id, im.img_id, ch.chunk_id,
             |    im.vec_id AS ivid, ch.vec_id AS cvid,
             |    SUM(CAST(a.v AS DOUBLE) * CAST(b.v AS DOUBLE)) AS dot
             |  FROM im JOIN ch ON ch.doc_id = im.doc_id
             |  JOIN ex a ON a.vec_id = im.vec_id
             |  JOIN ex b ON b.vec_id = ch.vec_id AND b.i = a.i
             |  GROUP BY 1, 2, 3, 4, 5),
             |scored AS (SELECT d.doc_id, d.img_id, d.chunk_id,
             |    CAST(ROUND(ROUND(d.dot / (ni.nrm * nh.nrm), 6) * 1e6)
             |      AS BIGINT) AS cm
             |  FROM dots d
             |  JOIN norms ni ON ni.vec_id = d.ivid
             |  JOIN norms nh ON nh.vec_id = d.cvid
             |  WHERE ni.nrm > 0 AND nh.nrm > 0),
             |best AS (SELECT doc_id, img_id, chunk_id, cm FROM (
             |    SELECT *, row_number() OVER (
             |      PARTITION BY doc_id, img_id ORDER BY cm DESC, chunk_id)
             |      AS rn
             |    FROM scored) WHERE rn = 1)
             |SELECT im.doc_id, im.img_id,
             |  COALESCE(nc.n_chunks, 0) AS n_chunks,
             |  b.chunk_id, b.cm AS cos_micros
             |FROM im LEFT JOIN nc ON nc.doc_id = im.doc_id
             |LEFT JOIN best b ON b.doc_id = im.doc_id
             |  AND b.img_id = im.img_id""".stripMargin)),

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

    // ---- M8: REAL decode -> average perceptual hash ---------------------
    // aHash over the 16x8 fixture on an 8x4 grid: NN-sample (the pinned
    // ImageResize index map), gray = r+g+b, strict mean threshold. The
    // oracle recomputes all 32 sampled grays from the closed form and
    // packs the bits into the same BIGINT layout — a decode or sampling
    // bug flips hash bits.
    Q("q_m8_ahash",
      (s, d) => Multimodal.imageAHash(s,
        Multimodal.synthesizeImages(s,
          Tables.documents(s, d).select(col("doc_id")), 16, 8,
          idCol = "doc_id"), 8, 4),
      Some(s"""WITH ${duckAHashRel("ho", pertR = false)}
              |SELECT media_id, ahash FROM ho""".stripMargin)),

    // ---- M9: perceptual-hash near-dup matching --------------------------
    // The image-dedup pipeline end-to-end: originals vs variants that
    // went through a deterministic pixel perturbation (re-encode stand-in)
    // plus a 2x NN downscale (aHash is invariant under the engine's own
    // NN resize by construction, so only the perturbation moves bits).
    // Banded candidate join is EXACT for hamming <= 3 with 4 bands
    // (pigeonhole); output is one best match per original. The oracle
    // brute-forces all pairs — equality proves the banding lost nothing.
    Q("q_m9_phash_match",
      (s, d) => {
        val ids = Tables.documents(s, d).select(col("doc_id"))
        // origs feeds BOTH fingerprint branches (originals + the
        // transformed variants) — checkpoint the synthesized bytes so
        // the PNG encode pass runs once, not once per branch
        val origs = graft.operators.Iterate.checkpoint(
          Multimodal.synthesizeImages(s, ids, 16, 8, idCol = "doc_id"))
        val varts = Multimodal.transformMedia(s,
          Multimodal.transformMedia(s, origs, Multimodal.PixelShift(1, 128)),
          Multimodal.ImageResize(8, 4))
        Multimodal.matchByHash(
          Multimodal.imageAHash(s, origs, 8, 4),
          Multimodal.imageAHash(s, varts, 8, 4),
          numBands = 4, bandBits = 8, maxHam = 3)
      },
      Some(s"""WITH ${duckAHashRel("ho", pertR = false)},
              |${duckAHashRel("hv", pertR = true)}
              |SELECT media_id, match_id, hamming FROM (
              |  SELECT o.media_id, v.media_id AS match_id,
              |    CAST(bit_count(xor(o.ahash, v.ahash)) AS INTEGER) AS hamming,
              |    row_number() OVER (PARTITION BY o.media_id
              |      ORDER BY bit_count(xor(o.ahash, v.ahash)), v.media_id) AS rn
              |  FROM ho o, hv v
              |  WHERE bit_count(xor(o.ahash, v.ahash)) <= 3)
              |WHERE rn = 1""".stripMargin)),

    // ---- M10: image dedup clusters (pHash pairs -> connected components)
    // The canonical-selection stage of the image-dedup pipeline: all
    // within-corpus pairs at hamming <= 3 (banded, pigeonhole-exact),
    // clustered by the shared CC machinery — the q_d6 shape on the
    // multimodal column. The oracle brute-forces the pairs and replays
    // the components as a recursive CTE; equality proves the banding
    // lost no pair and the relational CC converged to true components.
    Q("q_m10_phash_clusters",
      (s, d) => graft.operators.Dedup.connectedComponents(
        Multimodal.hashNearDupPairs(
          Multimodal.imageAHash(s,
            Multimodal.synthesizeImages(s,
              Tables.documents(s, d).select(col("doc_id")), 16, 8,
              idCol = "doc_id"), 8, 4),
          numBands = 4, bandBits = 8, maxHam = 3)),
      Some(s"""WITH RECURSIVE ${duckAHashRel("ho", pertR = false)},
              |prs AS (
              |  SELECT a.media_id AS a_id, b.media_id AS b_id
              |  FROM ho a JOIN ho b ON a.media_id < b.media_id
              |  WHERE bit_count(xor(a.ahash, b.ahash)) <= 3),
              |edges AS (
              |  SELECT a_id AS src, b_id AS dst FROM prs
              |  UNION SELECT b_id, a_id FROM prs),
              |cc(node, label) AS (
              |  SELECT DISTINCT src, src FROM edges
              |  UNION
              |  SELECT e.dst, c.label FROM cc c JOIN edges e ON e.src = c.node)
              |SELECT node, MIN(label) AS component FROM cc GROUP BY node"""
        .stripMargin)),

    // ---- M11: audio fingerprint near-dup matching -----------------------
    // The modality triad completed: chromaprint-lite fingerprints (band-
    // energy sign bits over the REAL WAV round-trip) for originals vs
    // SampleShift(5, 700) variants (a loudness-localized edit hitting
    // exactly segment 0), banded candidate join EXACT for hamming <= 3
    // with 4 bands (pigeonhole) + the band-bucket guard. The oracle
    // recomputes both fingerprint relations from the closed-form signal
    // and brute-forces ALL pairs — equality proves the band join lost
    // nothing and the codec round-trip read the samples exactly.
    Q("q_m11_audio_match",
      (s, d) => {
        val ids = Tables.documents(s, d).select(col("doc_id"))
        // origs feeds both fingerprint branches — synthesize once
        val origs = graft.operators.Iterate.checkpoint(
          Multimodal.synthesizeAudio(s, ids, nSamples = 160,
            sampleRate = 8000, idCol = "doc_id"))
        val varts = Multimodal.transformMedia(s, origs,
          Multimodal.SampleShift(5, 700))
        // distinct-signature collapse: this fixture is dup-heavy (~100
        // distinct fingerprints), so the media-level banded join is
        // Θ(dup²) per bucket while the hash-level one stays ~100×~100;
        // tie-break parity with plain matchByHash is spec-pinned
        Multimodal.matchByHashDistinct(
          Multimodal.audioFingerprint(s, origs),
          Multimodal.audioFingerprint(s, varts),
          numBands = 4, bandBits = 8, maxHam = 3)
      },
      Some(s"""WITH ${duckAudioFpRel("fo", shifted = false)},
              |${duckAudioFpRel("fv", shifted = true)}
              |SELECT media_id, match_id, hamming FROM (
              |  SELECT o.media_id, v.media_id AS match_id,
              |    CAST(bit_count(xor(o.ahash, v.ahash)) AS INTEGER) AS hamming,
              |    row_number() OVER (PARTITION BY o.media_id
              |      ORDER BY bit_count(xor(o.ahash, v.ahash)), v.media_id) AS rn
              |  FROM fo o, fv v
              |  WHERE bit_count(xor(o.ahash, v.ahash)) <= 3)
              |WHERE rn = 1""".stripMargin)),

    // ---- M12: audio dedup clusters (fingerprints -> CC) -----------------
    // The canonical-selection stage on the audio axis: originals UNION
    // their variants (ids offset by 1e6 — a corpus that really contains
    // near-dups), clustered through the DISTINCT-signature collapse
    // (hashDedupClusters): this fixture is dup-heavy by construction
    // (~100 distinct fingerprints over 2·|docs| media at sf0.1), so
    // media-level pair enumeration is Θ(dup²) ≈ 4.8M pairs while the
    // hash graph stays ~100 nodes — the operator the shape exists for.
    // The oracle brute-forces the MEDIA-level pairs over both closed-
    // form fingerprint relations and replays the components as a
    // recursive CTE; equality proves the collapse loses nothing.
    Q("q_m12_audio_clusters",
      (s, d) => {
        val ids = Tables.documents(s, d).select(col("doc_id"))
        // origs feeds both fingerprint branches — synthesize once
        val origs = graft.operators.Iterate.checkpoint(
          Multimodal.synthesizeAudio(s, ids, nSamples = 160,
            sampleRate = 8000, idCol = "doc_id"))
        val varts = Multimodal.transformMedia(s, origs,
          Multimodal.SampleShift(5, 700))
        val fps = Multimodal.audioFingerprint(s, origs).unionAll(
          Multimodal.audioFingerprint(s, varts)
            .select((col("media_id") + 1000000L).as("media_id"),
              col("ahash")))
        Multimodal.hashDedupClusters(fps,
          numBands = 4, bandBits = 8, maxHam = 3)
      },
      Some(s"""WITH RECURSIVE ${duckAudioFpRel("fo", shifted = false)},
              |${duckAudioFpRel("fv", shifted = true)},
              |fp AS (
              |  SELECT media_id, ahash FROM fo
              |  UNION ALL
              |  SELECT media_id + 1000000, ahash FROM fv),
              |prs AS (
              |  SELECT a.media_id AS a_id, b.media_id AS b_id
              |  FROM fp a JOIN fp b ON a.media_id < b.media_id
              |  WHERE bit_count(xor(a.ahash, b.ahash)) <= 3),
              |edges AS (
              |  SELECT a_id AS src, b_id AS dst FROM prs
              |  UNION SELECT b_id, a_id FROM prs),
              |cc(node, label) AS (
              |  SELECT DISTINCT src, src FROM edges
              |  UNION
              |  SELECT e.dst, c.label FROM cc c JOIN edges e ON e.src = c.node)
              |SELECT node, MIN(label) AS component FROM cc GROUP BY node"""
        .stripMargin)),

    // ---- M13: video fingerprint near-dup matching -----------------------
    // The modality x dedup matrix completed (images q_m9, audio q_m11):
    // per-sampled-frame aHash blocks concatenated into one 32-bit
    // signature over the REAL GVID parse + per-frame ImageIO decode;
    // variants get a frame-0-local pixel edit (FramePixelShift), so only
    // sample 0's bit block can move — hamming <= 3 < 4 bands keeps the
    // banded join pigeonhole-exact. Distinct-signature collapse (the
    // synth fixture folds to few distinct signatures — the dup-heavy
    // regime). Oracle: both fingerprint relations from the closed-form
    // pixels, ALL pairs brute-forced.
    Q("q_m13_video_match",
      (s, d) => {
        val ids = Tables.documents(s, d).select(col("doc_id"))
        // origs feeds both fingerprint branches — synthesize once
        val origs = graft.operators.Iterate.checkpoint(
          Multimodal.synthesizeVideos(s, ids, 16, 8,
            nFrames = 6, idCol = "doc_id"))
        val varts = Multimodal.transformMedia(s, origs,
          Multimodal.FramePixelShift(0, 1, 128))
        Multimodal.matchByHashDistinct(
          Multimodal.videoFingerprint(s, origs, 4, 4,
            sampleEvery = 4, maxSamples = 2),
          Multimodal.videoFingerprint(s, varts, 4, 4,
            sampleEvery = 4, maxSamples = 2),
          numBands = 4, bandBits = 8, maxHam = 3)
      },
      Some(s"""WITH ${duckVideoFpRel("fo", pertR = false)},
              |${duckVideoFpRel("fv", pertR = true)}
              |SELECT media_id, match_id, hamming FROM (
              |  SELECT o.media_id, v.media_id AS match_id,
              |    CAST(bit_count(xor(o.ahash, v.ahash)) AS INTEGER) AS hamming,
              |    row_number() OVER (PARTITION BY o.media_id
              |      ORDER BY bit_count(xor(o.ahash, v.ahash)), v.media_id) AS rn
              |  FROM fo o, fv v
              |  WHERE bit_count(xor(o.ahash, v.ahash)) <= 3)
              |WHERE rn = 1""".stripMargin)),

    // ---- M14: video dedup clusters (fingerprints -> CC) -----------------
    // Originals UNION frame-edited variants (ids offset by 1e6) through
    // the distinct-signature collapse and the shared CC; the oracle
    // brute-forces the MEDIA-level pairs and replays components as a
    // recursive CTE — the q_m10/q_m12 proof shape on the video axis.
    Q("q_m14_video_clusters",
      (s, d) => {
        val ids = Tables.documents(s, d).select(col("doc_id"))
        // origs feeds both fingerprint branches — synthesize once
        val origs = graft.operators.Iterate.checkpoint(
          Multimodal.synthesizeVideos(s, ids, 16, 8,
            nFrames = 6, idCol = "doc_id"))
        val varts = Multimodal.transformMedia(s, origs,
          Multimodal.FramePixelShift(0, 1, 128))
        val fps = Multimodal.videoFingerprint(s, origs, 4, 4, 4, 2)
          .unionAll(Multimodal.videoFingerprint(s, varts, 4, 4, 4, 2)
            .select((col("media_id") + 1000000L).as("media_id"),
              col("ahash")))
        Multimodal.hashDedupClusters(fps,
          numBands = 4, bandBits = 8, maxHam = 3)
      },
      Some(s"""WITH RECURSIVE ${duckVideoFpRel("fo", pertR = false)},
              |${duckVideoFpRel("fv", pertR = true)},
              |fp AS (
              |  SELECT media_id, ahash FROM fo
              |  UNION ALL
              |  SELECT media_id + 1000000, ahash FROM fv),
              |prs AS (
              |  SELECT a.media_id AS a_id, b.media_id AS b_id
              |  FROM fp a JOIN fp b ON a.media_id < b.media_id
              |  WHERE bit_count(xor(a.ahash, b.ahash)) <= 3),
              |edges AS (
              |  SELECT a_id AS src, b_id AS dst FROM prs
              |  UNION SELECT b_id, a_id FROM prs),
              |cc(node, label) AS (
              |  SELECT DISTINCT src, src FROM edges
              |  UNION
              |  SELECT e.dst, c.label FROM cc c JOIN edges e ON e.src = c.node)
              |SELECT node, MIN(label) AS component FROM cc GROUP BY node"""
        .stripMargin)),

    // ---- M15: multimodal benchmark decontamination ----------------------
    // The decontamination family's perceptual member: every corpus image
    // verdicts against a benchmark = the PixelShift'd variants of the
    // doc_id % 10 slice (a re-encoded eval set leaking into training —
    // exact byte matching would miss every one). Verdict per corpus
    // medium, kept = no benchmark hash within hamming 3; the oracle
    // brute-forces corpus x benchmark.
    Q("q_m15_media_decontaminate",
      (s, d) => {
        val docs = Tables.documents(s, d).select(col("doc_id"))
        val corpus = Multimodal.imageAHash(s,
          Multimodal.synthesizeImages(s, docs, 16, 8, idCol = "doc_id"),
          8, 4)
        val bench = Multimodal.imageAHash(s,
          Multimodal.transformMedia(s,
            Multimodal.synthesizeImages(s,
              docs.filter(col("doc_id") % 10 === 0), 16, 8,
              idCol = "doc_id"),
            Multimodal.PixelShift(1, 128)),
          8, 4)
        Multimodal.hashDecontaminate(corpus, bench,
          numBands = 4, bandBits = 8, maxHam = 3)
      },
      Some(s"""WITH ${duckAHashRel("ho", pertR = false)},
              |${duckAHashRel("hvall", pertR = true)},
              |hv AS (SELECT * FROM hvall WHERE media_id % 10 = 0),
              |best AS (
              |  SELECT o.media_id,
              |    MIN(bit_count(xor(o.ahash, v.ahash))) AS mh
              |  FROM ho o JOIN hv v
              |    ON bit_count(xor(o.ahash, v.ahash)) <= 3
              |  GROUP BY 1)
              |SELECT ho.media_id,
              |  CAST(best.mh AS INTEGER) AS min_bench_hamming,
              |  best.mh IS NULL AS kept
              |FROM ho LEFT JOIN best USING (media_id)""".stripMargin)),

    // ---- M16: permissive media triage ------------------------------------
    // The quarantine pass every decode-heavy stage depends on at scale:
    // a deterministic slice (doc_id % 13) gets its PNG signature zeroed
    // (CorruptHeader — every codec rejects it), and triage turns each
    // broken payload into a verdict ROW instead of a task failure. The
    // oracle needs only the corruption rule; err text is engine-owned
    // and stays out of the compared projection.
    Q("q_m16_media_triage",
      (s, d) => {
        val docs = Tables.documents(s, d).select(col("doc_id"))
        val media = Multimodal.synthesizeImages(s, docs, 16, 8,
          idCol = "doc_id")
        val bad = Multimodal.transformMedia(s,
          media.filter(col("media_id") % 13 === 0),
          Multimodal.CorruptHeader(8))
        Multimodal.mediaTriage(s,
            media.filter(col("media_id") % 13 =!= 0).unionAll(bad))
          .select(col("media_id"), col("mime"), col("ok"))
      },
      Some("""SELECT doc_id AS media_id, 'image/png' AS mime,
             |  doc_id % 13 <> 0 AS ok
             |FROM documents""".stripMargin)),

    // ---- M19: the composed media pipeline under ONE oracle ---------------
    // The q_x47 composition discipline on the media axis: triage ->
    // fingerprint -> distinct-collapse dedup -> perceptual
    // decontamination over one fixture (the doc_id % 5 audit slice —
    // decode cost stays bench-friendly). Fault-injected % 13 media drop
    // at triage, PixelShift near-dup variants (% 7, ids offset 1e6)
    // collapse to their originals, and the canonical survivors verdict
    // against the % 10 re-encoded benchmark. One hash covers all four
    // stages: a corrupt doc leaking past triage, a cluster picking the
    // wrong canonical, or a missed benchmark match each break it.
    Q("q_m19_media_pipeline",
      (s, d) => {
        val docs = Tables.documents(s, d).select(col("doc_id"))
          .filter(col("doc_id") % 5 === 0)
        // each branch synthesizes only ITS slice (building the full
        // relation per branch re-encodes everything 3x), and the union
        // checkpoints once — both consumers below (triage, the
        // survivors join) would otherwise re-run the synthesis
        def synth(slice: org.apache.spark.sql.DataFrame) =
          Multimodal.synthesizeImages(s, slice, 16, 8, idCol = "doc_id")
        val all = graft.operators.Iterate.checkpoint(
          synth(docs.filter(col("doc_id") % 13 =!= 0))
            .unionAll(Multimodal.transformMedia(s,
              synth(docs.filter(col("doc_id") % 13 === 0)),
              Multimodal.CorruptHeader(8)))
            .unionAll(Multimodal.transformMedia(s,
              synth(docs.filter(col("doc_id") % 7 === 0 &&
                col("doc_id") % 13 =!= 0)),
              Multimodal.PixelShift(1, 128))
              .select((col("media_id") + 1000000L).as("media_id"),
                col("bytes"), col("meta"))))
        val okIds = Multimodal.mediaTriage(s, all)
          .filter(col("ok")).select(col("media_id"))
        // checkpointed: consumed by the cluster pass AND the canon join
        val hashes = graft.operators.Iterate.checkpoint(
          Multimodal.imageAHash(s, all.join(okIds, Seq("media_id")), 8, 4))
        val clusters = Multimodal.hashDedupClusters(hashes,
          numBands = 4, bandBits = 8, maxHam = 3)
        val canon = hashes
          .join(clusters.withColumnRenamed("node", "media_id"),
            Seq("media_id"), "left")
          .filter(col("component").isNull ||
            col("component") === col("media_id"))
          .select(col("media_id"), col("ahash"))
        val bench = Multimodal.imageAHash(s,
          Multimodal.transformMedia(s,
            Multimodal.synthesizeImages(s,
              docs.filter(col("doc_id") % 10 === 0), 16, 8,
              idCol = "doc_id"),
            Multimodal.PixelShift(1, 128)),
          8, 4)
        Multimodal.hashDecontaminate(canon, bench,
          numBands = 4, bandBits = 8, maxHam = 3)
      },
      Some(s"""WITH RECURSIVE ${duckAHashRel("hall", pertR = false)},
              |${duckAHashRel("pall", pertR = true)},
              |ho AS (SELECT * FROM hall
              |  WHERE media_id % 5 = 0 AND media_id % 13 <> 0),
              |hv AS (SELECT media_id + 1000000 AS media_id, ahash
              |  FROM pall
              |  WHERE media_id % 5 = 0 AND media_id % 7 = 0
              |    AND media_id % 13 <> 0),
              |fp AS (SELECT media_id, ahash FROM ho
              |  UNION ALL SELECT media_id, ahash FROM hv),
              |prs AS (
              |  SELECT a.media_id AS a_id, b.media_id AS b_id
              |  FROM fp a JOIN fp b ON a.media_id < b.media_id
              |  WHERE bit_count(xor(a.ahash, b.ahash)) <= 3),
              |edges AS (
              |  SELECT a_id AS src, b_id AS dst FROM prs
              |  UNION SELECT b_id, a_id FROM prs),
              |cc(node, label) AS (
              |  SELECT DISTINCT src, src FROM edges
              |  UNION
              |  SELECT e.dst, c.label FROM cc c JOIN edges e ON e.src = c.node),
              |comp AS (SELECT node, MIN(label) AS component FROM cc
              |  GROUP BY 1),
              |canon AS (
              |  SELECT fp.media_id, fp.ahash
              |  FROM fp LEFT JOIN comp ON comp.node = fp.media_id
              |  WHERE comp.component IS NULL OR comp.component = fp.media_id),
              |bench AS (SELECT media_id, ahash FROM pall
              |  WHERE media_id % 5 = 0 AND media_id % 10 = 0),
              |best AS (
              |  SELECT c.media_id,
              |    MIN(bit_count(xor(c.ahash, b.ahash))) AS mh
              |  FROM canon c JOIN bench b
              |    ON bit_count(xor(c.ahash, b.ahash)) <= 3
              |  GROUP BY 1)
              |SELECT canon.media_id,
              |  CAST(best.mh AS INTEGER) AS min_bench_hamming,
              |  best.mh IS NULL AS kept
              |FROM canon LEFT JOIN best USING (media_id)""".stripMargin)),

    // ---- M17: full 64-bit aHash riding the simhash machinery -------------
    // Wide media hashes need no parallel stack: the 8x8 (64-bit,
    // Krawetz-original) aHash emits a 16-hex signature and flows through
    // the TEXT side's simhashNearDup (4x16-bit pigeonhole banding +
    // codegen'd hex_hamming). The oracle never packs 64 bits (DuckDB
    // refuses 1<<63): it compares the per-position BIT relations
    // directly and brute-forces all pairs — equality proves grid, hex
    // layout, banding, and the hamming kernel end to end.
    Q("q_m17_ahash64_pairs",
      (s, d) => graft.operators.Dedup.simhashNearDup(
        Multimodal.imageAHashHex(s,
          Multimodal.synthesizeImages(s,
            Tables.documents(s, d).select(col("doc_id")), 16, 8,
            idCol = "doc_id"), 8, 8), maxDist = 3)
        .select(col("a_id"), col("b_id"), col("hamming")),
      Some("""WITH g AS (SELECT doc_id AS media_id, j,
             |    (doc_id + sidx) % 256 + (doc_id*3 + sidx*5 + 17) % 256
             |      + (doc_id*7 + sidx*11 + 41) % 256 AS gray
             |  FROM (SELECT doc_id, j, 16 * (j // 8) + 2 * (j % 8) AS sidx
             |        FROM documents, (SELECT unnest(range(0, 64)) AS j))),
             |w AS (SELECT media_id, j, gray,
             |    SUM(gray) OVER (PARTITION BY media_id) AS tot FROM g),
             |b AS (SELECT media_id, j, gray * 64 > tot AS bit FROM w)
             |SELECT a_id, b_id, hamming FROM (
             |  SELECT x.media_id AS a_id, y.media_id AS b_id,
             |    CAST(COUNT(CASE WHEN x.bit <> y.bit THEN 1 END) AS INT)
             |      AS hamming
             |  FROM b x JOIN b y ON x.j = y.j AND x.media_id < y.media_id
             |  GROUP BY 1, 2)
             |WHERE hamming <= 3""".stripMargin)),

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
              |WHERE rnk <= 5""".stripMargin)),

    // ---- M18: paired image-text alignment (LAION-style CLIP gating) -----
    // Paired records synthesized engine-independently from embeddings:
    // even vec_id = the pair's image embedding, odd = its text embedding,
    // pair_id = vec_id div 2, source = 's' || pid % 4. Gate at 100k
    // micros (58/250 aligned at sf0.01); mining runs on the even-pid
    // audit slice (the minePred contract) against ALL texts. The oracle
    // replays the 6-dp micro cosine, the gate, and the top-1 mismatch
    // argmax (ties by lower alt id).
    Q("q_m18_pair_alignment",
      (s, d) => Multimodal.pairAlignment(embPairs(s, d), "pair_id",
        "source", "img_emb", "txt_emb", tauMicros = 100000L,
        minePred = col("pair_id") % 2 === 0),
      Some(s"""WITH $duckPairCos,
              |xs AS (
              |  SELECT a.pid AS qid, b.pid AS cid,
              |         SUM(CAST(a.e AS DOUBLE) * CAST(b.e AS DOUBLE)) AS dot
              |  FROM ix a JOIN tx b ON b.i = a.i
              |  WHERE a.pid % 2 = 0 AND b.pid <> a.pid
              |  GROUP BY 1, 2),
              |altm AS (
              |  SELECT c.qid, c.cid,
              |    CAST(ROUND(ROUND(c.dot / (nq.nrm * nc.nrm), 6) * 1e6)
              |      AS BIGINT) AS am
              |  FROM xs c
              |  JOIN inorm nq ON nq.pid = c.qid
              |  JOIN tnorm nc ON nc.pid = c.cid),
              |best AS (
              |  SELECT qid, cid, am FROM (
              |    SELECT *, row_number() OVER (
              |      PARTITION BY qid ORDER BY am DESC, cid) AS rn
              |    FROM altm) WHERE rn = 1)
              |SELECT o.pid AS pair_id,
              |  's' || CAST(o.pid % 4 AS VARCHAR) AS source,
              |  o.cm AS cos_micros, o.cm >= 100000 AS aligned,
              |  b.cid AS alt_id, b.am AS alt_micros,
              |  COALESCE(b.am > o.cm, false) AS mismatched
              |FROM ownm o LEFT JOIN best b ON b.qid = o.pid"""
        .stripMargin)),

    // ---- M21: pair mining from IVF-list candidates (the scale seam) -----
    // pairAlignmentWith fed by ivfPairCandidates — the full-corpus
    // candidate generator (SCALE.md's pairmine caveat answered). The
    // fixture plants cluster structure (dimension pid % 8 overwritten
    // with 100.0 on BOTH sides) so IVF recall is PROVABLE: within-
    // cluster cosine ~0.998 dwarfs cross-cluster ~0.01, the first-8
    // text centroids land one per cluster, and every image's true best
    // text sits in its own probed list. The oracle is q_m18's BRUTE-
    // FORCE mining chain over the planted vectors — it knows nothing
    // of IVF, so a recall miss is a red hash, not a silent quality
    // leak (the q_d8 shared-oracle discipline).
    Q("q_m21_pair_alignment_ivf",
      (s, d) => {
        val base = embPairs(s, d)
        def plant(v: org.apache.spark.sql.Column) =
          transform(v, (e, i) =>
            when(i === col("pair_id") % 8, lit(100.0f)).otherwise(e))
        val pl = base.select(col("pair_id"), col("source"),
          plant(col("img_emb")).as("img_emb"),
          plant(col("txt_emb")).as("txt_emb"))
        val cands = Multimodal.ivfPairCandidates(pl, "pair_id",
            "img_emb", "txt_emb", numCentroids = 8, nProbe = 2)
          .filter(col("query_id") % 2 === 0)
        Multimodal.pairAlignmentWith(pl, "pair_id", "source",
          "img_emb", "txt_emb", tauMicros = 100000L, candidates = cands)
      },
      Some(s"""WITH $duckPairCosPlanted,
              |xs AS (
              |  SELECT a.pid AS qid, b.pid AS cid,
              |         SUM(a.e * b.e) AS dot
              |  FROM ix a JOIN tx b ON b.i = a.i
              |  WHERE a.pid % 2 = 0 AND b.pid <> a.pid
              |  GROUP BY 1, 2),
              |altm AS (
              |  SELECT c.qid, c.cid,
              |    CAST(ROUND(ROUND(c.dot / (nq.nrm * nc.nrm), 6) * 1e6)
              |      AS BIGINT) AS am
              |  FROM xs c
              |  JOIN inorm nq ON nq.pid = c.qid
              |  JOIN tnorm nc ON nc.pid = c.cid),
              |best AS (
              |  SELECT qid, cid, am FROM (
              |    SELECT *, row_number() OVER (
              |      PARTITION BY qid ORDER BY am DESC, cid) AS rn
              |    FROM altm) WHERE rn = 1)
              |SELECT o.pid AS pair_id,
              |  's' || CAST(o.pid % 4 AS VARCHAR) AS source,
              |  o.cm AS cos_micros, o.cm >= 100000 AS aligned,
              |  b.cid AS alt_id, b.am AS alt_micros,
              |  COALESCE(b.am > o.cm, false) AS mismatched
              |FROM ownm o LEFT JOIN best b ON b.qid = o.pid"""
        .stripMargin)),

    // ---- M20: per-source alignment-rate parity audit ---------------------
    // The four-fifths gateParity shape over the M18 gate (mining off —
    // the parity audit needs only the verdicts): a source shipping
    // miscaptioned pairs wholesale flags before the gate reshapes the
    // mix. Same exact-ppm arithmetic as q_v22.
    Q("q_m20_alignment_parity",
      (s, d) => Multimodal.pairAlignmentParity(
        Multimodal.pairAlignment(embPairs(s, d), "pair_id", "source",
          "img_emb", "txt_emb", tauMicros = 100000L,
          minePred = lit(false)),
        "source"),
      Some(s"""WITH $duckPairCos,
              |g AS (SELECT 's' || CAST(pid % 4 AS VARCHAR) AS source,
              |    cm >= 100000 AS accept FROM ownm),
              |per AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n,
              |    CAST(COUNT(CASE WHEN accept THEN 1 END) AS BIGINT)
              |      AS n_accept,
              |    CAST(COUNT(CASE WHEN accept IS NULL THEN 1 END) AS BIGINT)
              |      AS n_null_verdict
              |  FROM g GROUP BY 1),
              |r AS (SELECT *, CAST((2 * n_accept * 1000000 + n) // (2 * n)
              |    AS BIGINT) AS accept_ppm FROM per),
              |b AS (SELECT MAX(accept_ppm) AS best FROM r)
              |SELECT source, n, n_accept, n_null_verdict, accept_ppm,
              |  CAST(CASE WHEN best > 0 THEN
              |    (2 * accept_ppm * 1000000 + best) // (2 * best) END
              |    AS BIGINT) AS parity_ppm,
              |  COALESCE(CASE WHEN best > 0 THEN
              |    (2 * accept_ppm * 1000000 + best) // (2 * best) < 800000
              |    END, false) AS flagged
              |FROM r, b""".stripMargin))
  )

  /** The M18/M20 paired fixture: even vec_id = image side, odd = text
    * side, pair_id = vec_id div 2, source = 's' || pid % 4 — both
    * engines derive it from the embeddings parquet alone. */
  private def embPairs(s: org.apache.spark.sql.SparkSession, d: String) = {
    val emb = Tables.embeddings(s, d)
    emb.filter(col("vec_id") % 2 === 0)
      .select(expr("vec_id div 2").as("pair_id"),
        col("embedding").as("img_emb"))
      .join(emb.filter(col("vec_id") % 2 === 1)
        .select(expr("vec_id div 2").as("pair_id"),
          col("embedding").as("txt_emb")), Seq("pair_id"))
      .withColumn("source",
        concat(lit("s"), (col("pair_id") % 4).cast("string")))
  }

  /** The q_m21 oracle prefix: [[duckPairCos]]'s chain with the planted
    * cluster dimension (i = pid % 8 + 1 overwritten with 100.0 on both
    * sides — Spark's 0-based transform index maps to the 1-based
    * unnest ordinal) injected between the explode and the norms. */
  private val duckPairCosPlanted =
    """img AS (SELECT vec_id // 2 AS pid, embedding AS v
      |  FROM embeddings WHERE vec_id % 2 = 0),
      |txt AS (SELECT vec_id // 2 AS pid, embedding AS v
      |  FROM embeddings WHERE vec_id % 2 = 1),
      |ix0 AS (SELECT pid, unnest(v) AS e,
      |  unnest(range(1, len(v) + 1)) AS i FROM img),
      |tx0 AS (SELECT pid, unnest(v) AS e,
      |  unnest(range(1, len(v) + 1)) AS i FROM txt),
      |ix AS (SELECT pid, CASE WHEN i = pid % 8 + 1 THEN 100.0
      |  ELSE CAST(e AS DOUBLE) END AS e, i FROM ix0),
      |tx AS (SELECT pid, CASE WHEN i = pid % 8 + 1 THEN 100.0
      |  ELSE CAST(e AS DOUBLE) END AS e, i FROM tx0),
      |inorm AS (SELECT pid, sqrt(SUM(e * e)) AS nrm FROM ix GROUP BY 1),
      |tnorm AS (SELECT pid, sqrt(SUM(e * e)) AS nrm FROM tx GROUP BY 1),
      |own AS (SELECT a.pid, SUM(a.e * b.e)
      |  AS dot FROM ix a JOIN tx b ON b.pid = a.pid AND b.i = a.i
      |  GROUP BY 1),
      |ownm AS (SELECT o.pid,
      |    CAST(ROUND(ROUND(o.dot / (n1.nrm * n2.nrm), 6) * 1e6) AS BIGINT)
      |      AS cm
      |  FROM own o JOIN inorm n1 ON n1.pid = o.pid
      |  JOIN tnorm n2 ON n2.pid = o.pid)""".stripMargin

  /** Shared oracle prefix: the paired fixture's positional explode,
    * norms, and own-pair integer-micro cosine `ownm(pid, cm)`. */
  private val duckPairCos =
    """img AS (SELECT vec_id // 2 AS pid, embedding AS v
      |  FROM embeddings WHERE vec_id % 2 = 0),
      |txt AS (SELECT vec_id // 2 AS pid, embedding AS v
      |  FROM embeddings WHERE vec_id % 2 = 1),
      |ix AS (SELECT pid, unnest(v) AS e,
      |  unnest(range(1, len(v) + 1)) AS i FROM img),
      |tx AS (SELECT pid, unnest(v) AS e,
      |  unnest(range(1, len(v) + 1)) AS i FROM txt),
      |inorm AS (SELECT pid, sqrt(SUM(CAST(e AS DOUBLE) * CAST(e AS DOUBLE)))
      |  AS nrm FROM ix GROUP BY 1),
      |tnorm AS (SELECT pid, sqrt(SUM(CAST(e AS DOUBLE) * CAST(e AS DOUBLE)))
      |  AS nrm FROM tx GROUP BY 1),
      |own AS (SELECT a.pid, SUM(CAST(a.e AS DOUBLE) * CAST(b.e AS DOUBLE))
      |  AS dot FROM ix a JOIN tx b ON b.pid = a.pid AND b.i = a.i
      |  GROUP BY 1),
      |ownm AS (SELECT o.pid,
      |    CAST(ROUND(ROUND(o.dot / (n1.nrm * n2.nrm), 6) * 1e6) AS BIGINT)
      |      AS cm
      |  FROM own o JOIN inorm n1 ON n1.pid = o.pid
      |  JOIN tnorm n2 ON n2.pid = o.pid)""".stripMargin
}
