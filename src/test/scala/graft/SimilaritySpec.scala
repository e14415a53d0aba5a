package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity

class SimilaritySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private def emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("ivf assignment: inline and broadcast paths agree exactly") {
    val a = Similarity.ivfAssignInline(emb, 8, "vec_id", "embedding")
    val b = Similarity.ivfAssignBroadcast(emb, 8, "vec_id", "embedding")
    assert(a.count() === b.count())
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("ivf dispatch: large quantizer takes the broadcast path (no giant literal plan)") {
    // 300 > IvfInlineLimit → must route through the join+agg shape
    val p = Similarity.ivfAssign(emb, 300, "vec_id", "embedding")
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastNestedLoopJoin"),
      s"expected the broadcast path for 300 centroids:\n$p")
    assert(p.contains("HashAggregate"), s"argmax should hash, not sort:\n$p")
    assert(!p.contains("SortAggregate"), s"argmax should hash, not sort:\n$p")
    assert(!p.contains("Window"), p)
  }

  test("ivf top-k recall vs brute force is sane at nProbe=2/8 lists") {
    val exact = Similarity.bruteForceTopK(emb, col("vec_id") < 5, 5)
      .select(col("query_id"), col("neighbor_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Similarity.ivfTopK(emb, col("vec_id") < 5,
        numCentroids = 8, nProbe = 2, k = 5)
      .select(col("query_id"), col("neighbor_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall >= 0.2, s"recall $recall implausibly low") // probing 2/8 lists
  }
}
