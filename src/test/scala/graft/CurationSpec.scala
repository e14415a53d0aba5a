package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Curation

class CurationSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private def docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  test("curation composes: every stage removes something, splits are labeled") {
    val total = docs.count()
    val out = Curation.curate(docs)
    val survivors = out.count()
    assert(survivors > 0 && survivors < total,
      s"curation should drop some of $total docs, kept $survivors")
    val bySplit = out.groupBy(col("split")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySplit.keySet === Set("train", "val", "test"))
    // 90/5/5 md5 buckets: train must dominate by construction
    assert(bySplit("train") > bySplit("val") + bySplit("test"))
    // output ids are unique (each survivor labeled exactly once)
    assert(out.select("doc_id").distinct().count() === survivors)
  }

  test("curation is deterministic") {
    val a = Curation.curate(docs).orderBy("doc_id").collect()
    val b = Curation.curate(docs).orderBy("doc_id").collect()
    assert(a.toSeq === b.toSeq)
  }

  test("joint curation: only surviving endpoints can knock a doc out") {
    import spark.implicits._
    val quality = ("the quick brown fox jumps over a lazy dog and then " +
      "runs far away into the deep woods of the north to rest").trim
    val fixtureDocs = Seq(
      (0L, "a b c"),           // fails the quality gate (3 tokens)
      (1L, quality + " one"),  // quality
      (2L, quality + " two"),  // quality, embedding far from the others
      (3L, quality + " three") // quality, embedding ~ doc 1's
    ).toDF("doc_id", "text")
    val emb = Seq(
      (0L, Array(1f, 0f, 0f, 0f)),      // ~ e1: a near-dup pair with doc 1
      (1L, Array(1f, 0.05f, 0f, 0f)),
      (2L, Array(0f, 1f, 0f, 0f)),      // cosine ~0.05 to the others
      (3L, Array(0.99f, 0.06f, 0f, 0f)) // ~ e1: drops (higher id)
    ).toDF("vec_id", "embedding")
    val out = Curation.curateJoint(fixtureDocs, emb, minTokens = 20)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // doc 0: rejected by quality. doc 3: dropped as near-dup of survivor 1.
    // doc 1: its near-dup partner 0 is NOT a survivor, so 1 must stay.
    assert(out === Set(1L, 2L))
  }
}
