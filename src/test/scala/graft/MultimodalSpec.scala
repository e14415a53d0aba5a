package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal
import graft.sources.Discovery

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("frameStats: frame math and hash over opaque payloads, no decode") {
    import spark.implicits._
    val media = Multimodal.fromDocuments(
      Seq((1L, "a" * 130), (2L, "b")).toDF("doc_id", "text"))
    val out = Multimodal.frameStats(spark, media, frameBytes = 64, sampleEvery = 2)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getLong(1) === 130 && out(1L).getLong(3) === 3 && out(1L).getLong(4) === 2)
    assert(out(2L).getLong(1) === 1 && out(2L).getLong(3) === 1 && out(2L).getLong(4) === 1)
  }

  test("image codec: known-pixel PNG and BMP decode to exact features") {
    // 2x2 image with hand-picked channel values
    //   (10,20,30) (40,50,60)
    //   (70,80,90) (200,210,220)
    val argb = Array(
      0xff000000 | (10 << 16) | (20 << 8) | 30,
      0xff000000 | (40 << 16) | (50 << 8) | 60,
      0xff000000 | (70 << 16) | (80 << 8) | 90,
      0xff000000 | (200 << 16) | (210 << 8) | 220)
    val meta = Multimodal.MediaMeta("image/png", 2, 2)
    for (bytes <- Seq(Multimodal.ImageCodec.encodePng(argb, 2, 2),
        Multimodal.ImageCodec.encodeBmp(argb, 2, 2))) {
      val f = Multimodal.ImageIoDecoder.decode(bytes, meta)
      assert(f.toSeq === Seq(2f, 2f, (10 + 40 + 70 + 200) / 4f,
        (20 + 50 + 80 + 210) / 4f, (30 + 60 + 90 + 220) / 4f))
    }
    // non-image bytes fail loudly, naming the declared mime
    val ex = intercept[IllegalArgumentException](
      Multimodal.ImageIoDecoder.decode("not a png".getBytes, meta))
    assert(ex.getMessage.contains("image/png"))
  }

  test("image resize: nearest-neighbor sample map is exact") {
    // 2x2 -> 1x1 keeps the top-left pixel (src index 0*2/1 = 0)
    val argb = Array(
      0xff000000 | (10 << 16) | (20 << 8) | 30,
      0xff000000 | (40 << 16) | (50 << 8) | 60,
      0xff000000 | (70 << 16) | (80 << 8) | 90,
      0xff000000 | (200 << 16) | (210 << 8) | 220)
    val meta = Multimodal.MediaMeta("image/png", 2, 2)
    val (small, m2) = Multimodal.ImageResize(1, 1)(
      Multimodal.ImageCodec.encodePng(argb, 2, 2), meta)
    assert(m2 === Multimodal.MediaMeta("image/png", 1, 1))
    assert(Multimodal.ImageIoDecoder.decode(small, m2).toSeq ===
      Seq(1f, 1f, 10f, 20f, 30f))
    // 2x2 -> 4x4 upscale: every dst pixel maps to floor(x*2/4) — the
    // four quadrants replicate the four source pixels
    val (big, m4) = Multimodal.ImageResize(4, 4)(
      Multimodal.ImageCodec.encodePng(argb, 2, 2), meta)
    val f4 = Multimodal.ImageIoDecoder.decode(big, m4)
    assert(f4.take(2).toSeq === Seq(4f, 4f))
    assert(f4.drop(2).toSeq === Seq((10 + 40 + 70 + 200) / 4f,
      (20 + 50 + 80 + 210) / 4f, (30 + 60 + 90 + 220) / 4f))
  }

  test("synthesized fixture: decoded pixels match the closed form") {
    import spark.implicits._
    val media = Multimodal.synthesizeImages(spark,
      Seq(0L, 7L, 123L).toDF("media_id"), 16, 8)
    val out = Multimodal.extractFeatures(spark, media,
      Multimodal.ImageIoDecoder, frameBytes = 64, sampleEvery = 4)
      .collect().map(f => f.media_id -> f.feature).toMap
    for (id <- Seq(0L, 7L, 123L)) {
      val sums = (0 until 128).foldLeft((0L, 0L, 0L)) { case ((r, g, b), i) =>
        (r + Multimodal.PixelSynth.r(id, i),
          g + Multimodal.PixelSynth.g(id, i),
          b + Multimodal.PixelSynth.b(id, i))
      }
      assert(out(id).toSeq === Seq(16f, 8f, (sums._1 / 128.0).toFloat,
        (sums._2 / 128.0).toFloat, (sums._3 / 128.0).toFloat))
    }
  }

  test("wav codec: samples round-trip the RIFF container bit-exactly") {
    val samples = Array[Short](0, 1000, -1000, 32767, -32768, 5, -5)
    val bytes = Multimodal.WavCodec.encodePcm16(samples, 8000)
    val (back, rate) = Multimodal.WavCodec.decodePcm16(bytes)
    assert(back.toSeq === samples.toSeq && rate === 8000)
  }

  test("audio features: silence, clipping, and known signals score exactly") {
    import spark.implicits._
    def media(id: Long, s: Array[Short]) = Multimodal.MediaRecord(
      id, Multimodal.WavCodec.encodePcm16(s, 8000),
      Multimodal.MediaMeta("audio/wav", s.length, 8000))
    val rows = Seq(
      media(1L, Array[Short](0, 0, 0, 0)),                  // silence
      media(2L, Array[Short](32767, -32768, 32767, -32768)), // clipping
      media(3L, Array[Short](3, -4, 0, 5)))                  // mixed, with a zero
    val out = Multimodal.audioFeatures(spark, rows.toDF())
      .collect().map(r => r.getLong(0) ->
        (r.getLong(3), r.getLong(4), r.getDouble(5))).toMap
    assert(out(1L) === ((0L, 0L, 0.0)), "silence: zero peak, zc, rms")
    assert(out(2L)._1 === 32768L && out(2L)._2 === 3L, "full-scale clipping")
    // mixed: crossings at (3,-4) and (-4,... 0 never counts ...) — only
    // the strict sign flips; rms = sqrt((9+16+0+25)/4)
    assert(out(3L)._2 === 1L)
    assert(out(3L)._3 === BigDecimal(math.sqrt(50.0 / 4))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("video: container round-trips, sampled frames decode to closed-form sums, motion is exact") {
    import spark.implicits._
    // container round-trip
    val frames = Seq(Array[Byte](1, 2, 3), Array[Byte](4), Array[Byte](5, 6))
    val (w, h, back) = Multimodal.GvidCodec.decode(
      Multimodal.GvidCodec.encode(frames, 9, 7))
    assert(w === 9 && h === 7 && back.map(_.toSeq) === frames.map(_.toSeq))
    assert(intercept[IllegalArgumentException](
      Multimodal.GvidCodec.decode(Array[Byte](1, 2, 3, 4, 5)))
      .getMessage.contains("GVID"))
    // real per-frame decode: features equal the closed form for id 7,
    // 16x8 frames, 6 frames sampled every 4 -> frames {0, 4}
    val out = Multimodal.videoFeatures(spark,
        Multimodal.synthesizeVideos(spark, Seq(7L).toDF("media_id"), 16, 8, 6),
        sampleEvery = 4).head
    def frameSums(f: Int) = (0 until 128).foldLeft((0L, 0L, 0L)) {
      case ((r, g, b), i) =>
        (r + Multimodal.PixelSynth.r(7L, f * 128 + i),
          g + Multimodal.PixelSynth.g(7L, f * 128 + i),
          b + Multimodal.PixelSynth.b(7L, f * 128 + i))
    }
    val (r0, g0, b0) = frameSums(0)
    val (r4, g4, b4) = frameSums(4)
    assert(out.getLong(1) === 6L && out.getLong(2) === 2L)
    assert((out.getLong(3), out.getLong(4), out.getLong(5)) ===
      ((r0 + r4, g0 + g4, b0 + b4)))
    assert(out.getLong(6) === math.abs(r4 - r0), "motion_r")
  }

  test("imageAHash: invariant under NN downscale; PixelShift moves few bits") {
    import spark.implicits._
    val ids = Seq(3L, 41L, 250L).toDF("media_id")
    val origs = Multimodal.synthesizeImages(spark, ids, 16, 8)
    def hashes(m: org.apache.spark.sql.DataFrame) =
      Multimodal.imageAHash(spark, m, 8, 4)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ho = hashes(origs)
    // scale invariance: the 2x NN downscale samples exactly the pixels
    // the 8x4 hash grid samples, so the hash is bit-identical
    val hr = hashes(Multimodal.transformMedia(spark, origs,
      Multimodal.ImageResize(8, 4)))
    assert(hr === ho, "aHash must be invariant under the engine's NN resize")
    // perturbing one sampled pixel flips at most a few bits
    val hp = hashes(Multimodal.transformMedia(spark, origs,
      Multimodal.PixelShift(1, 128)))
    for (id <- Seq(3L, 41L, 250L)) {
      val ham = java.lang.Long.bitCount(ho(id) ^ hp(id))
      assert(ham <= 3, s"one-pixel shift moved $ham bits for media $id")
    }
    // hash layout: 32-bit grid fits a non-negative long
    assert(ho.values.forall(h => h >= 0 && h < (1L << 32)))
    // grid too large for a long fails loudly
    assert(intercept[IllegalArgumentException](
      Multimodal.imageAHash(spark, origs, 8, 8)).getMessage.contains("64 bits"))
  }

  test("matchByHash: banded match equals brute force; pigeonhole guard") {
    import spark.implicits._
    val ids = spark.range(1, 201).select(col("id").as("media_id"))
    val origs = Multimodal.synthesizeImages(spark, ids, 16, 8)
    val varts = Multimodal.transformMedia(spark,
      Multimodal.transformMedia(spark, origs, Multimodal.PixelShift(1, 128)),
      Multimodal.ImageResize(8, 4))
    val ho = Multimodal.imageAHash(spark, origs, 8, 4)
    val hv = Multimodal.imageAHash(spark, varts, 8, 4)
    val got = Multimodal.matchByHash(ho, hv, numBands = 4, bandBits = 8, maxHam = 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getInt(2)))).toMap
    // brute-force reference over the collected hashes
    val o = ho.collect().map(r => r.getLong(0) -> r.getLong(1))
    val v = hv.collect().map(r => r.getLong(0) -> r.getLong(1))
    val expect = o.flatMap { case (oid, oh) =>
      val cands = v.map { case (vid, vh) => (java.lang.Long.bitCount(oh ^ vh), vid) }
        .filter(_._1 <= 3)
      if (cands.isEmpty) None else Some(oid -> { val m = cands.min; (m._2, m._1) })
    }.toMap
    assert(got === expect, "banding must lose no pair within maxHam < numBands")
    assert(got.nonEmpty && got.forall(_._2._2 <= 3))
    // maxHam >= numBands breaks the pigeonhole guarantee -> loud refusal
    assert(intercept[IllegalArgumentException](
      Multimodal.matchByHash(ho, hv, 4, 8, 4)).getMessage.contains("pigeonhole"))
    // band-bucket guard: a degenerate cap raises ON THE COMPOSED PATH
    // (consuming the result), naming the offending band; at-cap result
    // is unchanged
    val ex = intercept[Exception](
      Multimodal.matchByHash(ho, hv, 4, 8, 3, maxBandBucket = 3).collect())
    assert(ex.getMessage.contains("matchByHash") &&
      ex.getMessage.contains("quadratic per bucket"))
    val atCap = Multimodal.matchByHash(ho, hv, 4, 8, 3, maxBandBucket = 200)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getInt(2)))).toMap
    assert(atCap === got, "an un-tripped cap must not change the result")
  }

  test("audioFingerprint: closed-form bits over the real WAV round-trip; " +
      "SampleShift moves only its window's bits; gain-invariance holds") {
    import spark.implicits._
    val ids = Seq(3L, 41L, 250L).toDF("media_id")
    val origs = Multimodal.synthesizeAudio(spark, ids, nSamples = 160)
    def fps(m: org.apache.spark.sql.DataFrame) =
      Multimodal.audioFingerprint(spark, m)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val fo = fps(origs)
    // hand replay of the closed form: 32 segments of 5 samples, energy
    // sums, strict band-vs-window threshold — must match the engine's
    // codec-round-tripped fingerprint bit for bit
    def expect(id: Long): Long = {
      val v = Array.tabulate(160)(i => (((id * 31 + i * 17) % 2000) - 1000))
      val e = Array.tabulate(32)(s =>
        (s * 5 until s * 5 + 5).map(i => v(i) * v(i)).sum)
      (0 until 32).map { j =>
        val tot = (j / 4 * 4 until j / 4 * 4 + 4).map(e).sum
        if (e(j) * 4 > tot) 1L << j else 0L
      }.sum
    }
    for (id <- Seq(3L, 41L, 250L))
      assert(fo(id) === expect(id),
        s"fingerprint of media $id must replay from the closed form")
    assert(fo.values.forall(h => h >= 0 && h < (1L << 32)))
    // a first-5-samples shift is confined to segment 0's window: only
    // bits 0..3 may move
    val fs = fps(Multimodal.transformMedia(spark, origs,
      Multimodal.SampleShift(5, 700)))
    for (id <- Seq(3L, 41L, 250L)) {
      val moved = fo(id) ^ fs(id)
      assert((moved & ~0xfL) === 0L,
        s"media $id: a segment-0 edit moved bits outside window 0 " +
          s"(diff ${moved.toBinaryString})")
    }
    // uniform gain scales every energy together: bits are invariant
    // (2x gain = 4x every energy; the strict compare is homogeneous)
    val doubled = origs.as[Multimodal.MediaRecord].map { rec =>
      val (s, r) = Multimodal.WavCodec.decodePcm16(rec.bytes)
      Multimodal.MediaRecord(rec.media_id,
        Multimodal.WavCodec.encodePcm16(s.map(x => (x * 2).toShort), r),
        rec.meta)
    }.toDF()
    assert(fps(doubled) === fo,
      "uniform gain must not move any fingerprint bit")
    // too few samples to fill the grid fails loudly
    val tiny = Multimodal.synthesizeAudio(spark, ids, nSamples = 16)
    assert(intercept[Exception](
      Multimodal.audioFingerprint(spark, tiny).collect())
      .getMessage.contains("cannot fill"))
  }

  test("audio near-dup: banded fingerprint match equals brute force; " +
      "variant clusters join their originals") {
    import spark.implicits._
    val ids = spark.range(1, 201).select(col("id").as("media_id"))
    val origs = Multimodal.synthesizeAudio(spark, ids, nSamples = 160)
    val varts = Multimodal.transformMedia(spark, origs,
      Multimodal.SampleShift(5, 700))
    val fo = Multimodal.audioFingerprint(spark, origs)
    val fv = Multimodal.audioFingerprint(spark, varts)
    val got = Multimodal.matchByHash(fo, fv, numBands = 4, bandBits = 8,
        maxHam = 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getInt(2)))).toMap
    val o = fo.collect().map(r => r.getLong(0) -> r.getLong(1))
    val v = fv.collect().map(r => r.getLong(0) -> r.getLong(1))
    val expect = o.flatMap { case (oid, oh) =>
      val cands = v.map { case (vid, vh) =>
        (java.lang.Long.bitCount(oh ^ vh), vid) }.filter(_._1 <= 3)
      if (cands.isEmpty) None else Some(oid -> { val m = cands.min; (m._2, m._1) })
    }.toMap
    assert(got === expect, "banding must lose no pair within maxHam < numBands")
    assert(got.nonEmpty && got.forall(_._2._2 <= 3))
    // the distinct-signature collapse returns the identical match
    // relation — including the (hamming, min v_id) tie-break
    val gotDistinct = Multimodal.matchByHashDistinct(fo, fv,
        numBands = 4, bandBits = 8, maxHam = 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getInt(2)))).toMap
    assert(gotDistinct === got,
      "matchByHashDistinct must equal media-level matchByHash")
    // clusters: originals + offset variants through the shared CC — every
    // matched variant lands in its original's component
    val fps2 = fo.unionAll(fv.select((col("media_id") + 1000000L)
      .as("media_id"), col("ahash")))
    val comp = graft.operators.Dedup.connectedComponents(
        Multimodal.hashNearDupPairs(fps2, 4, 8, 3))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val joined = got.count { case (oid, (vid, _)) =>
      comp.get(oid).isDefined &&
        comp.get(vid + 1000000L) === comp.get(oid) }
    assert(joined === got.size,
      "every hamming<=3 original/variant pair must share a component")
    // the distinct-signature collapse is provably the same relation as
    // the media-level composition — on a dup-heavy fixture where the
    // media pair count dwarfs the hash pair count
    val collapsed = Multimodal.hashDedupClusters(fps2, 4, 8, 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(collapsed === comp,
      "hashDedupClusters must equal connectedComponents(hashNearDupPairs)")
    // a media whose hash is unique and isolated is excluded (no edges),
    // exactly like the media-level CC
    val lone = fo.limit(0).sparkSession.range(1)
      .select(lit(777777L).as("media_id"),
        lit((1L << 32) - 1L).as("ahash")) // all-ones: far from every fp
    val withLone = Multimodal.hashDedupClusters(fps2.unionAll(lone), 4, 8, 3)
      .collect().map(r => r.getLong(0)).toSet
    assert(!withLone.contains(777777L),
      "an isolated media must not surface in the cluster relation")
  }

  test("videoFingerprint: per-sampled-frame aHash blocks; a frame-local " +
      "edit moves only its block; short videos pad with zero bits") {
    import spark.implicits._
    val ids = Seq(3L, 41L, 250L).toDF("media_id")
    val origs = Multimodal.synthesizeVideos(spark, ids, 16, 8, nFrames = 6)
    def fps(m: org.apache.spark.sql.DataFrame) =
      Multimodal.videoFingerprint(spark, m, 4, 4, sampleEvery = 4,
          maxSamples = 2)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val fo = fps(origs)
    // hand replay: frames 0 and 4, 4x4 grid, flat = f*128 + 32*(j/4) +
    // 4*(j%4), gray = r+g+b from PixelSynth, strict per-frame mean
    def expect(id: Long): Long = {
      def gray(flat: Long) = (id + flat) % 256 +
        (id * 3 + flat * 5 + 17) % 256 + (id * 7 + flat * 11 + 41) % 256
      (0 until 2).map { s =>
        val g = Array.tabulate(16)(j =>
          gray(s * 4 * 128 + 32 * (j / 4) + 4 * (j % 4)))
        val tot = g.sum
        (0 until 16).map(j =>
          if (g(j) * 16 > tot) 1L << (s * 16 + j) else 0L).sum
      }.sum
    }
    for (id <- Seq(3L, 41L, 250L))
      assert(fo(id) === expect(id),
        s"fingerprint of media $id must replay from the closed form")
    // frame-0 edit: only sample 0's block (bits 0..15) may move
    val fe = fps(Multimodal.transformMedia(spark, origs,
      Multimodal.FramePixelShift(0, 1, 128)))
    for (id <- Seq(3L, 41L, 250L)) {
      val moved = fo(id) ^ fe(id)
      assert((moved & ~0xffffL) === 0L,
        s"media $id: a frame-0 edit moved bits outside block 0")
    }
    // an edit to an UNSAMPLED frame (1 of every-4 sampling) moves nothing
    val fu = fps(Multimodal.transformMedia(spark, origs,
      Multimodal.FramePixelShift(1, 1, 128)))
    assert(fu === fo, "an unsampled-frame edit must not move any bit")
    // short video: 2 frames at every-4 sampling = 1 sample; block-1 bits
    // stay zero
    val short = Multimodal.synthesizeVideos(spark, ids, 16, 8, nFrames = 2)
    assert(fps(short).values.forall(h => (h & ~0xffffL) === 0L),
      "a one-sample video must leave the tail bits zero")
  }

  test("hashDecontaminate: re-encoded benchmark leaks drop, clean media " +
      "keep, an empty benchmark keeps everything") {
    import spark.implicits._
    val ids = spark.range(1, 101).select(col("id").as("media_id"))
    val corpus = Multimodal.imageAHash(spark,
      Multimodal.synthesizeImages(spark, ids, 16, 8), 8, 4)
    // benchmark = perturbed variants of media 1..10 (a re-encoded eval
    // set — byte-identical matching would find none of them)
    val bench = Multimodal.imageAHash(spark,
      Multimodal.transformMedia(spark,
        Multimodal.synthesizeImages(spark,
          ids.filter(col("media_id") <= 10), 16, 8),
        Multimodal.PixelShift(1, 128)), 8, 4)
    val out = Multimodal.hashDecontaminate(corpus, bench, 4, 8, 3)
      .collect().map(r => r.getLong(0) ->
        ((if (r.isNullAt(1)) -1 else r.getInt(1)), r.getBoolean(2))).toMap
    assert(out.size === 100, "a verdict per corpus medium")
    // brute-force reference
    val ch = corpus.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val bh = bench.collect().map(_.getLong(1))
    val expectDropped = ch.filter { case (_, h) =>
      bh.exists(b => java.lang.Long.bitCount(h ^ b) <= 3) }.keySet
    assert(out.filterNot(_._2._2).keySet === expectDropped,
      "dropped set must equal the brute-force contaminated set")
    assert(expectDropped.nonEmpty && expectDropped.size < 100,
      "the fixture must actually separate")
    // empty benchmark: everything keeps, scores null
    val none = Multimodal.hashDecontaminate(corpus, bench.limit(0), 4, 8, 3)
      .collect()
    assert(none.length === 100 && none.forall(r =>
      r.isNullAt(1) && r.getBoolean(2)),
      "an empty benchmark must keep every medium with a null score")
  }

  test("imageAHashHex: 64-bit hash matches the hand bit-pack, rides " +
      "simhashNearDup with exact hamming, non-64 grids refuse") {
    import spark.implicits._
    val ids = Seq(3L, 41L, 250L).toDF("media_id")
    val media = Multimodal.synthesizeImages(spark, ids, 16, 8)
    val hx = Multimodal.imageAHashHex(spark, media, 8, 8)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    def expect(id: Long): Long = {
      def gray(sidx: Long) = (id + sidx) % 256 +
        (id * 3 + sidx * 5 + 17) % 256 + (id * 7 + sidx * 11 + 41) % 256
      val g = Array.tabulate(64)(j => gray(16 * (j / 8) + 2 * (j % 8)))
      val tot = g.sum
      (0 until 64).foldLeft(0L)((h, j) =>
        if (g(j) * 64 > tot) h | (1L << j) else h)
    }
    for (id <- Seq(3L, 41L, 250L))
      assert(hx(id) === f"${expect(id)}%016x",
        s"hex hash of media $id must replay from the closed form")
    // hamming through the simhash machinery equals the integer xor
    val pairs = graft.operators.Dedup.simhashNearDup(
        Multimodal.imageAHashHex(spark, media, 8, 8), maxDist = 3)
      .collect()
    val brute = Seq((3L, 41L), (3L, 250L), (41L, 250L)).flatMap {
      case (a, b) =>
        val h = java.lang.Long.bitCount(expect(a) ^ expect(b))
        if (h <= 3) Some((a, b, h)) else None
    }
    assert(pairs.map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      .toSet === brute.toSet)
    assert(intercept[IllegalArgumentException](
      Multimodal.imageAHashHex(spark, media, 8, 4)).getMessage
      .contains("64 bits"))
  }

  test("mediaTriage: corrupt payloads become verdict rows across all " +
      "three codecs, intact ones pass, unknown mimes are unroutable") {
    import spark.implicits._
    val ids = Seq(1L, 2L).toDF("media_id")
    def corrupt(df: org.apache.spark.sql.DataFrame) =
      Multimodal.transformMedia(spark,
        df.filter(col("media_id") === 2L), Multimodal.CorruptHeader(8))
    val img = Multimodal.synthesizeImages(spark, ids, 16, 8)
    val wav = Multimodal.synthesizeAudio(spark, ids, 160)
    val vid = Multimodal.synthesizeVideos(spark, ids, 16, 8, nFrames = 3)
    val alien = spark.range(1).select(lit(9L).as("media_id"),
      lit(Array[Byte](1, 2, 3)).as("bytes"),
      struct(lit("application/pdf").as("mime"), lit(0).as("width"),
        lit(0).as("height")).as("meta"))
    val mixed = Seq(img -> 100L, wav -> 200L, vid -> 300L).map {
        case (m, off) =>
          m.filter(col("media_id") === 1L)
            .select((col("media_id") + off).as("media_id"),
              col("bytes"), col("meta"))
            .unionAll(corrupt(m)
              .select((col("media_id") + off).as("media_id"),
                col("bytes"), col("meta")))
      }.reduce(_ unionAll _).unionAll(alien)
    val out = Multimodal.mediaTriage(spark, mixed)
      .collect().map(r => r.getLong(0) ->
        ((r.getBoolean(2), Option(r.getString(3))))).toMap
    assert(out.size === 7)
    // intact image/audio/video pass with a null err
    for (id <- Seq(101L, 201L, 301L))
      assert(out(id) === ((true, None)), s"intact medium $id must pass")
    // every corrupted payload fails with a NAMED error, per codec
    for (id <- Seq(102L, 202L, 302L))
      assert(!out(id)._1 && out(id)._2.exists(_.nonEmpty),
        s"corrupt medium $id must verdict false with a named error")
    assert(out(9L)._1 === false &&
      out(9L)._2.get.contains("unroutable"),
      "unknown mimes are named, not crashed on")
  }

  test("pairAlignment: planted mismatches are mined (ties by lower id), " +
      "the gate is exact micros, null/zero-norm pairs surface unaligned") {
    import spark.implicits._
    val pairs = Seq(
      // p1: perfectly aligned own pair
      (1L, "a", Some(Seq(1f, 0f)), Some(Seq(1f, 0f))),
      // p2: orthogonal own pair whose image PREFERS p1/p5's caption
      (2L, "a", Some(Seq(1f, 0f)), Some(Seq(0f, 1f))),
      // p3: own cos exactly 0.8 — aligned at tau 750000, still mismatched
      (3L, "b", Some(Seq(0f, 1f)), Some(Seq(0.6f, 0.8f))),
      // p4: null text — no own cosine, image still mines
      (4L, "b", Some(Seq(1f, 0f)), None),
      // p5: zero-norm image — no own cosine, never mined; its text ranks
      (5L, "c", Some(Seq(0f, 0f)), Some(Seq(1f, 0f)))
    ).toDF("pair_id", "source", "img_emb", "txt_emb")
    val out = Multimodal.pairAlignment(pairs, "pair_id", "source",
        "img_emb", "txt_emb", tauMicros = 750000L, minePred = lit(true))
      .collect().map(r => r.getLong(0) -> ((
        if (r.isNullAt(2)) None else Some(r.getLong(2)), r.getBoolean(3),
        if (r.isNullAt(4)) None else Some(r.getLong(4)),
        if (r.isNullAt(5)) None else Some(r.getLong(5)),
        r.getBoolean(6)))).toMap
    // p1: own 1e6; best alt = p5's identical caption (tie 1e6 with
    // itself excluded; candidates 2:0, 3:600000, 5:1e6) — NOT mismatched
    assert(out(1L) === ((Some(1000000L), true, Some(5L), Some(1000000L),
      false)))
    // p2: own 0; alts 1 and 5 tie at 1e6 -> lower id 1; mismatched
    assert(out(2L) === ((Some(0L), false, Some(1L), Some(1000000L), true)))
    // p3: own exactly 800000 (aligned); p2's caption matches at 1e6
    assert(out(3L) === ((Some(800000L), true, Some(2L), Some(1000000L),
      true)), "a pair can pass the gate and still be mismatched")
    // p4: null text -> null cosine, unaligned, mining still runs but a
    // missing baseline can never claim mismatch
    assert(out(4L) === ((None, false, Some(1L), Some(1000000L), false)))
    // p5: zero-norm image -> no cosine, no mining row
    assert(out(5L) === ((None, false, None, None, false)))
    // the minePred slice: only p2 mines, everyone else carries nulls
    val sliced = Multimodal.pairAlignment(pairs, "pair_id", "source",
        "img_emb", "txt_emb", tauMicros = 750000L,
        minePred = col("pair_id") === 2L)
      .collect().map(r => r.getLong(0) -> r.isNullAt(4)).toMap
    assert(!sliced(2L) && sliced(1L) && sliced(3L),
      "mining is bounded to the minePred audit slice")
    // per-source parity: a=1/2, b=1/2, c=0/1 -> c flags at 4/5ths
    val par = Multimodal.pairAlignmentParity(
      Multimodal.pairAlignment(pairs, "pair_id", "source", "img_emb",
        "txt_emb", tauMicros = 750000L, minePred = lit(false)), "source")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(4), r.getBoolean(6)))).toMap
    assert(par("a") === ((500000L, false)) && par("b") === ((500000L, false)))
    assert(par("c") === ((0L, true)), "the all-misaligned source flags")
  }

  test("pairAlignmentWith: candidate-driven mining equals brute force " +
      "when candidates contain the argmax; a missed candidate bounds " +
      "recall; the plan is keyed joins, no broadcast nested loop") {
    import spark.implicits._
    val pairs = Seq(
      (1L, "a", Some(Seq(1f, 0f)), Some(Seq(1f, 0f))),
      (2L, "a", Some(Seq(1f, 0f)), Some(Seq(0f, 1f))),
      (3L, "b", Some(Seq(0f, 1f)), Some(Seq(0.6f, 0.8f))),
      (4L, "b", Some(Seq(1f, 0f)), None),
      (5L, "c", Some(Seq(0f, 0f)), Some(Seq(1f, 0f)))
    ).toDF("pair_id", "source", "img_emb", "txt_emb")
    val brute = Multimodal.pairAlignment(pairs, "pair_id", "source",
      "img_emb", "txt_emb", tauMicros = 750000L, minePred = lit(true))
    // the FULL candidate grid reproduces brute force exactly
    val ids = (1L to 5L)
    val full = ids.flatMap(q => ids.map(c => (q, c)))
      .toDF("query_id", "cand_id")
    val viaFull = Multimodal.pairAlignmentWith(pairs, "pair_id", "source",
      "img_emb", "txt_emb", tauMicros = 750000L, candidates = full)
    assert(viaFull.exceptAll(brute).isEmpty && brute.exceptAll(viaFull).isEmpty,
      "a candidate set containing every pair must equal brute force")
    // a blocked set that still contains each image's true best text
    // (1->5, 2->1, 3->2, 4->1) is also identical
    val blocked = Seq((1L, 5L), (1L, 3L), (2L, 1L), (3L, 2L), (4L, 1L),
      (5L, 1L)).toDF("query_id", "cand_id")
    val viaBlocked = Multimodal.pairAlignmentWith(pairs, "pair_id",
      "source", "img_emb", "txt_emb", tauMicros = 750000L,
      candidates = blocked)
    assert(viaBlocked.exceptAll(brute).isEmpty &&
      brute.exceptAll(viaBlocked).isEmpty,
      "argmax-preserving blocking must not change any verdict")
    // candidate recall bounds mining recall: drop image 2's true best
    // and it falls back to the best REMAINING candidate
    val lossy = Seq((2L, 3L)).toDF("query_id", "cand_id")
    val deg = Multimodal.pairAlignmentWith(pairs, "pair_id", "source",
        "img_emb", "txt_emb", tauMicros = 750000L, candidates = lossy)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(4)) None else Some(r.getLong(4)))).toMap
    assert(deg(2L) === Some(3L) && deg(1L) === None,
      "mining sees exactly the candidates it was given")
    // scale shape: no broadcast nested loop anywhere in the plan
    val plan = viaBlocked.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"candidate mining must stay on keyed equi-joins:\n$plan")
  }

  test("ivfPairCandidates: planted clusters make IVF recall provable — " +
      "blocked mining equals brute force, wrong-list probing degrades " +
      "it (the oracle-equality gate is not vacuous), inputs validated") {
    import spark.implicits._
    // 24 pairs in 4 planted clusters: dimension pid % 4 carries 100,
    // the rest deterministic sub-0.1 noise — within-cluster cosine
    // ~0.999 dwarfs cross-cluster, and the first-4 text centroids land
    // one per cluster
    val pairs = (0L until 24L).map { pid =>
      val c = (pid % 4).toInt
      def vec(salt: Int) = (0 until 8).map(i =>
        if (i == c) 100f
        else ((pid * 7 + i * 3 + salt) % 10).toFloat / 100f)
      (pid, s"s${pid % 2}", vec(0), vec(5))
    }.toDF("pair_id", "source", "img_emb", "txt_emb")
    val brute = Multimodal.pairAlignment(pairs, "pair_id", "source",
      "img_emb", "txt_emb", tauMicros = 900000L, minePred = lit(true))
    val cands = Multimodal.ivfPairCandidates(pairs, "pair_id",
      "img_emb", "txt_emb", numCentroids = 4, nProbe = 1)
    val ivf = Multimodal.pairAlignmentWith(pairs, "pair_id", "source",
      "img_emb", "txt_emb", tauMicros = 900000L, candidates = cands)
    assert(ivf.exceptAll(brute).isEmpty && brute.exceptAll(ivf).isEmpty,
      "every image's true best text sits in its own probed list")
    // the blocking is real: one probed list of ~6 texts per query, not
    // the full 24-text grid
    assert(cands.count() === 24L * 6,
      "each query's candidates are exactly its own cluster's texts")
    // negative control: probe the WRONG lists (cluster c images against
    // cluster (c+1)%4 texts) — outputs must diverge, so the shared
    // brute-force oracle genuinely gates recall
    val rot = pairs.select(col("pair_id").as("query_id"),
        (col("pair_id") % 4).as("qc"))
      .join(pairs.select(col("pair_id").as("cand_id"),
        ((col("pair_id") + 1) % 4).as("qc")), Seq("qc"))
      .select(col("query_id"), col("cand_id"))
    val degraded = Multimodal.pairAlignmentWith(pairs, "pair_id",
      "source", "img_emb", "txt_emb", tauMicros = 900000L,
      candidates = rot)
    assert(degraded.exceptAll(brute).count() > 0,
      "wrong-list candidates must under-report the best alt")
    intercept[IllegalArgumentException](Multimodal.ivfPairCandidates(
      pairs, "pair_id", "img_emb", "txt_emb", 4, 5))
  }

  test("mediaTriage catch discipline: NonFatal becomes a verdict, a " +
      "fatal VM error propagates (infrastructure != data corruption)") {
    val soft = Multimodal.triageAttempt(
      throw new RuntimeException("bad magic"))
    assert(soft === Left("RuntimeException: bad magic"))
    val fatal = intercept[OutOfMemoryError](
      Multimodal.triageAttempt(throw new OutOfMemoryError("codec blew up")))
    assert(fatal.getMessage === "codec blew up",
      "an OOM inside a codec must kill the task, not become ok=false")
    intercept[LinkageError](
      Multimodal.triageAttempt(throw new LinkageError("missing native")))
  }

  test("videoFrameHashes + videoSceneCuts: the per-frame relation drives " +
      "cut detection that matches a driver-side hamming replay; " +
      "single-frame videos have no defined jump") {
    import spark.implicits._
    val ids = Seq(1L, 2L, 3L).toDF("media_id")
    val vids = Multimodal.synthesizeVideos(spark, ids, 16, 8, nFrames = 6)
    val fh = Multimodal.videoFrameHashes(spark, vids, 4, 4)
    val rows = fh.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(rows.size === 18, "three videos x six frames")
    // driver-side replay: consecutive hamming, cuts at tau = 6
    val expected = (1L to 3L).map { m =>
      val hs = (0L to 5L).map(f => rows((m, f)))
      val jumps = hs.sliding(2).map(p =>
        java.lang.Long.bitCount(p(0) ^ p(1)).toLong).toSeq
      m -> ((jumps.count(_ >= 6L).toLong, jumps.max))
    }.toMap
    val out = Multimodal.videoSceneCuts(fh, tauBits = 6)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    (1L to 3L).foreach { m =>
      assert(out(m) === ((6L, expected(m)._1, expected(m)._2)),
        s"media $m must match the driver-side hamming replay")
    }
    // a single-frame video: one frame, zero cuts, NO defined jump
    val one = Multimodal.videoSceneCuts(
      Multimodal.videoFrameHashes(spark,
        Multimodal.synthesizeVideos(spark, Seq(9L).toDF("media_id"),
          16, 8, nFrames = 1), 4, 4), tauBits = 6).collect().head
    assert((one.getLong(1), one.getLong(2), one.isNullAt(3)) ===
      ((1L, 0L, true)))
  }

  test("interleaveAssign: images attach to their doc's best chunk, ties " +
      "to the earliest position, unplaceable images surface with null, " +
      "the per-doc chunk cap raises") {
    import spark.implicits._
    val chunks = Seq(
      (1L, 0L, Seq(1f, 0f)), (1L, 1L, Seq(0f, 1f)),
      (2L, 0L, Seq(1f, 0f)), (2L, 1L, Seq(1f, 0f)), // identical -> tie
      (3L, 0L, Seq(0f, 0f)) // zero-norm: invalid, doc 3 has NO valid chunk
    ).toDF("doc_id", "chunk_id", "chunk_vec")
    val images = Seq(
      (1L, 10L, Seq(0.9f, 0.1f)), // -> chunk 0
      (1L, 11L, Seq(0.1f, 0.9f)), // -> chunk 1
      (2L, 20L, Seq(0.5f, 0.5f)), // tie between identical chunks -> 0
      (3L, 30L, Seq(1f, 0f)), // no valid chunk in doc 3
      (1L, 12L, null.asInstanceOf[Seq[Float]]) // null image embedding
    ).toDF("doc_id", "img_id", "img_vec")
    val out = Multimodal.interleaveAssign(images, chunks)
      .collect().map(r => r.getLong(1) ->
        ((r.getLong(2), if (r.isNullAt(3)) None else Some(r.getLong(3)),
          if (r.isNullAt(4)) None else Some(r.getLong(4))))).toMap
    assert(out(10L)._2 === Some(0L) && out(11L)._2 === Some(1L))
    assert(out(10L)._3.get > 900000L, "cosine of near-parallel vectors")
    assert(out(20L) === ((2L, Some(0L), Some(707107L))),
      "identical chunks tie to the earliest position; cos = 1/sqrt(2)")
    assert(out(30L) === ((0L, None, None)),
      "a doc with no valid chunk places nothing, n_chunks says why")
    assert(out(12L)._2 === None && out(12L)._1 === 2L,
      "a null image embedding is unplaceable but still surfaces")
    val ex = intercept[Exception](
      Multimodal.interleaveAssign(images, chunks, maxChunksPerDoc = 1)
        .collect())
    assert(ex.getMessage.contains("images x chunks"))
    // a chunk id outside [0, 2^32) would corrupt the packed argmax —
    // the ordinal guard raises instead
    val badChunks = Seq((1L, -1L, Seq(1f, 0f)))
      .toDF("doc_id", "chunk_id", "chunk_vec")
    val ex2 = intercept[Exception](
      Multimodal.interleaveAssign(images, badChunks).collect())
    assert(ex2.getMessage.contains("outside [0, 2^32)"))
  }

  test("Discovery.latestFiles: extension filter, mtime desc, cap") {
    val dir = java.nio.file.Files.createTempDirectory("graft-disc")
    for (i <- 1 to 7) {
      val f = dir.resolve(s"f$i.csv")
      java.nio.file.Files.writeString(f, s"$i")
      f.toFile.setLastModified(1700000000000L + i * 1000)
    }
    java.nio.file.Files.writeString(dir.resolve("ignore.xml"), "x")
    val got = Discovery.latestFiles(spark, dir.toString, ".csv", 5)
    assert(got.size === 5)
    assert(got.head.endsWith("f7.csv") && got.last.endsWith("f3.csv"))
    assert(Discovery.latestFiles(spark, "/nonexistent-dir-xyz", ".csv") === Seq.empty)
  }
}
