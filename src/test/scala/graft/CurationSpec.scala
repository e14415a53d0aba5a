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
}
