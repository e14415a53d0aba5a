package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dsir

class DsirSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def corpus = {
    import spark.implicits._
    // target-ish docs talk about cats, pool noise talks about stock tickers
    Seq(
      (1L, "the cat sat on the mat", true),
      (2L, "a cat and a cat again", true),
      (3L, "cats cat mat sat", true),
      (4L, "ticker up ticker down volume", false),
      (5L, "volume ticker close open close", false),
      (6L, "the cat likes the mat", false), // pool doc that LOOKS like target
      (7L, "open close volume spread", false)
    ).toDF("doc_id", "text", "is_tgt")
  }

  test("target-like pool docs outweigh noise docs") {
    val w = Dsir.importanceWeights(corpus, "doc_id", "text",
      col("is_tgt"), buckets = 1024)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(w.size === 7)
    // doc 6 shares the target vocabulary; docs 4/5/7 don't
    assert(w(6L) > w(4L) && w(6L) > w(5L) && w(6L) > w(7L))
  }

  test("selectTopN returns best-first ranks and respects n") {
    val top = Dsir.selectTopN(corpus, "doc_id", "text",
      col("is_tgt"), n = 3, buckets = 1024).collect()
    assert(top.map(_.getInt(2)).toSeq === Seq(1, 2, 3))
    val weights = top.map(_.getDouble(1)).toSeq
    assert(weights === weights.sorted.reverse)
    // all selected docs are target-vocabulary docs
    assert(top.map(_.getLong(0)).forall(Set(1L, 2L, 3L, 6L)))
  }

  test("zero-token docs are excluded; bad args fail fast") {
    import spark.implicits._
    val df = corpus.union(Seq((8L, "   ", false)).toDF("doc_id", "text", "is_tgt"))
    val w = Dsir.importanceWeights(df, "doc_id", "text", col("is_tgt"), 1024)
    assert(!w.collect().map(_.getLong(0)).contains(8L))
    intercept[IllegalArgumentException](
      Dsir.selectTopN(corpus, "doc_id", "text", col("is_tgt"), 0))
    intercept[IllegalArgumentException](
      Dsir.importanceWeights(corpus, "doc_id", "text", col("is_tgt"), 1))
  }
}
