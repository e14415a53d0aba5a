package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.tools.EndToEnd

/** The composed pretraining build: stage counts must be monotone
  * (each gate only removes), the tokenizer store must exist and drive
  * the token output, and the packs must respect the budget discipline
  * PackingSpec pins for the operator. */
class EndToEndSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("the end-to-end build runs at sf0.001 with monotone stages and real outputs") {
    val out = java.nio.file.Files.createTempDirectory("e2e").toString
    val r = EndToEnd.run(spark, "/root/testdata/sf0.001", out)
    assert(r.nDocs > 0)
    assert(r.nCurated <= r.nDocs, "curation only removes")
    assert(r.nTrain <= r.nCurated, "the train split is a subset")
    assert(r.nSafe <= r.nTrain, "the DLP quarantine only removes")
    assert(r.nHostKept <= r.nSafe, "the host-rank gate only removes")
    assert(r.nHostKept < r.nSafe,
      "the planted bottom-half hosts make the gate provably non-vacuous")
    assert(r.nClean <= r.nHostKept, "decontamination only removes")
    assert(r.nClean > 0, "a healthy corpus survives the gates")
    assert(r.nPacked > 0 && r.nPacks > 0 && r.nPacks <= r.nPacked)
    // the tokenizer stores landed and the token output reads back
    assert(spark.read.parquet(s"$out/bpe/merges").count() > 0)
    assert(spark.read.parquet(s"$out/bpe/vocab").count() > 0)
    val tokens = spark.read.parquet(s"$out/tokens")
    assert(tokens.count() === r.nClean, "every clean doc tokenized")
    // no unk ids when encoding the training corpus against its own vocab
    assert(tokens.filter(array_contains(col("token_ids"), -1)).count() === 0)
    // manifest mirrors the returned counts
    val m = spark.read.parquet(s"$out/manifest")
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(m === Map("docs" -> r.nDocs, "curated" -> r.nCurated,
      "train" -> r.nTrain, "dlp_safe" -> r.nSafe,
      "host_ranked" -> r.nHostKept, "clean" -> r.nClean,
      "packed_docs" -> r.nPacked, "packs" -> r.nPacks))
    // the mixture report landed, covers every clean doc, and the
    // dedup discount is a real number: effective <= raw per source
    val mix = spark.read.parquet(s"$out/mixture_report")
    assert(mix.count() > 0)
    assert(mix.agg(sum(col("n_docs"))).head.getLong(0) === r.nClean,
      "every clean doc sits in exactly one source row")
    assert(mix.filter(col("eff_tokens_micro") >
      col("n_tokens") * 1000000L).count() === 0,
      "the effective count can never exceed raw tokens")
  }
}
