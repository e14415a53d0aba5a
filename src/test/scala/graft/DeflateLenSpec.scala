package graft

import java.util.zip.Deflater

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.DeflateLen
import graft.operators.TextAnalysis

class DeflateLenSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def reference(s: String): Int = {
    val d = new Deflater(6, true)
    d.setInput(s.getBytes("UTF-8"))
    d.finish()
    val buf = new Array[Byte](8192)
    var total = 0
    while (!d.finished()) total += d.deflate(buf)
    d.end()
    total
  }

  test("deflate_len matches a direct zlib reference, interpreted and codegen'd") {
    import spark.implicits._
    val texts = Seq("hello world", "aaaaaaaaaaaaaaaaaaaaaaaaaaaa",
      "the quick brown fox jumps over the lazy dog", "ünïcödé — tæxt")
    // interpreted eval
    texts.foreach { t =>
      assert(DeflateLen.compute(UTF8String.fromString(t)) === reference(t))
    }
    // through the SQL surface (extensions injection) = codegen path
    val got = texts.toDF("t")
      .selectExpr("t", "deflate_len(t) AS n")
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    texts.foreach(t => assert(got(t) === reference(t)))
  }

  test("compression ratio separates repetitive from diverse text") {
    import spark.implicits._
    val repetitive = ("spam ham " * 200).trim
    val diverse = (0 until 200).map(i => s"w${i}q${i * 7 % 97}").mkString(" ")
    val out = Seq((0L, repetitive), (1L, diverse)).toDF("doc_id", "text")
    val ratios = TextAnalysis.compressionRatio(out, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(ratios(0L) < ratios(1L) / 3,
      s"repetitive ${ratios(0L)} should compress far below diverse ${ratios(1L)}")
  }

  test("deflate_len: null in, null out; deterministic across runs") {
    import spark.implicits._
    val df = Seq(Some("abc"), None).toDF("t")
      .selectExpr("deflate_len(t) AS n")
    val rows = df.collect()
    assert(!rows(0).isNullAt(0) && rows(1).isNullAt(0))
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val a = TextAnalysis.compressionRatio(docs, "text", "doc_id").orderBy("doc_id").collect()
    val b = TextAnalysis.compressionRatio(docs, "text", "doc_id").orderBy("doc_id").collect()
    assert(a.toSeq === b.toSeq)
  }
}
