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

  test("curation funnel: complete source x stage grid, monotone counts, " +
      "null sources visible, zero cells present") {
    import spark.implicits._
    val mix = Seq(
      (1L, Option("srcA"), "the quick brown fox jumps over the lazy dog " +
        "and then the fox rests in a field of green grass all day long"),
      (2L, Option("srcA"), "the quick brown fox jumps over the lazy dog " +
        "and then the fox rests in a field of green grass all day long"),
      (3L, Option("srcB"), "tiny"),
      (4L, Option.empty[String], "the quick brown fox jumps over a very " +
        "lazy dog and then the fox naps in a sunny field of grass today")
    ).toDF("doc_id", "source", "text")
    val f = Curation.curationFunnel(mix)
      .collect().map(r => (r.getString(2), r.getInt(0)) ->
        ((r.getString(1), r.getLong(3)))).toMap
    assert(f.size === 12, "3 sources x 4 stages, every cell present")
    // srcB dies at the quality gate but its zero cells remain
    assert(f(("srcB", 0)) === (("raw", 1L)) &&
      f(("srcB", 1)) === (("quality", 0L)) &&
      f(("srcB", 3)) === (("near_dup", 0L)))
    // srcA: both docs pass quality, exact dedup keeps one
    assert(f(("srcA", 1))._2 === 2L && f(("srcA", 2))._2 === 1L)
    // the null source groups under the sentinel and survives
    assert(f(("<null>", 3))._2 === 1L)
    // counts never increase down the funnel
    for (s <- Seq("srcA", "srcB", "<null>"); st <- 0 to 2)
      assert(f((s, st))._2 >= f((s, st + 1))._2)
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
