package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal
import graft.sources.Discovery

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("extractFeatures: frame math, hash, and deterministic stub features") {
    import spark.implicits._
    val media = Multimodal.fromDocuments(
      Seq((1L, "a" * 130), (2L, "b")).toDF("doc_id", "text"))
    val out = Multimodal.extractFeatures(spark, media,
      Multimodal.DeterministicFakeDecoder, frameBytes = 64, sampleEvery = 2)
      .collect().map(f => f.media_id -> f).toMap
    assert(out(1L).byte_len === 130 && out(1L).n_frames === 3 && out(1L).n_sampled === 2)
    assert(out(2L).byte_len === 1 && out(2L).n_frames === 1 && out(2L).n_sampled === 1)
    assert(out(1L).feature.length === 4)
    // determinism: same bytes → same stub feature
    val again = Multimodal.extractFeatures(spark, media,
      Multimodal.DeterministicFakeDecoder, 64, 2).collect()
      .find(_.media_id == 1L).get
    assert(again.feature.toSeq === out(1L).feature.toSeq)
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
