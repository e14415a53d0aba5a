package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

class DedupClusterSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def components(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    Dedup.connectedComponents(pairs.toDF("a_id", "b_id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("chain collapses to one component labeled by its min id") {
    val got = components(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)))
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L))
  }

  test("disjoint components keep separate min labels") {
    val got = components(Seq((10L, 11L), (20L, 21L), (21L, 22L), (11L, 12L)))
    assert(got === Map(10L -> 10L, 11L -> 10L, 12L -> 10L,
      20L -> 20L, 21L -> 20L, 22L -> 20L))
  }

  test("duplicate and reversed pairs do not change the result") {
    val got = components(Seq((2L, 1L), (1L, 2L), (2L, 1L), (3L, 2L)))
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("star graph converges in one round regardless of edge direction") {
    val got = components(Seq((5L, 1L), (5L, 2L), (5L, 3L), (5L, 4L)))
    assert(got.values.toSet === Set(1L))
    assert(got.keySet === Set(1L, 2L, 3L, 4L, 5L))
  }

  test("cluster keeper semantics: one keeper per component on real pairs") {
    val pairs = Dedup.minhashCandidates(
      Dedup.docShingles(
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet"),
        "text", "doc_id", distinct = false), 8, 2)
    val cc = Dedup.connectedComponents(pairs)
    // every component's label is a member of the component
    val bad = cc.groupBy(col("component")).agg(min(col("node")).as("mn"))
      .filter(col("component") =!= col("mn")).count()
    assert(bad === 0)
  }
}
