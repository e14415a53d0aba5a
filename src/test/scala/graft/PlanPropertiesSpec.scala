package graft

import org.scalatest.funsuite.AnyFunSuite

/** Regression guards for the scale-critical physical-plan properties:
  * these are the shapes that make the queries hold at 100 TB, and they
  * must not silently degrade as queries evolve. (AQE hides codegen spans
  * pre-execution, so assertions stick to join strategy, pushdown, and
  * aggregation structure.)
  */
class PlanPropertiesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def plan(q: String): String =
    SparkEntry.queries(q)(spark, dir).queryExecution.executedPlan.toString

  test("lookup join broadcasts the small side (no sort-merge, no shuffle of the big side)") {
    val p = plan("q_j1_lookup_join")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("scan pruning: filters reach the parquet scan and columns are pruned") {
    val p = plan("q_s1_scan_prune")
    assert(p.contains("PushedFilters: ["), p)
    assert(p.contains("ReadSchema"), p)
    // the query projects a narrow set — the scan must not read all columns
    assert(!p.contains("o_comment"), s"unpruned scan:\n$p")
  }

  test("flagship aggregation is two-phase (partial before the exchange)") {
    val p = plan("q1_agg")
    val firstAgg = p.indexOf("HashAggregate")
    val firstEx = p.indexOf("Exchange")
    assert(firstAgg >= 0 && firstEx >= 0, p)
    // partial aggregate appears below the exchange => printed after it
    assert(p.indexOf("HashAggregate", firstEx) > firstEx,
      s"no map-side partial aggregation:\n$p")
  }

  test("similarity scoring runs on the native kernel, not interpreted HOFs") {
    val p = plan("q_sim1_cosine_topk").toLowerCase
    assert(p.contains("vecdot") || p.contains("vec_dot"), p)
    assert(!p.contains("aggregate(zip_with"), p)
  }

  test("inline IVF assignment is map-only: no join, no window") {
    // the small-quantizer operator path keeps the zero-shuffle shape
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val p = graft.operators.Similarity
      .ivfAssignInline(emb, 8, "vec_id", "embedding")
      .queryExecution.executedPlan.toString
    assert(!p.contains("Join"), s"inline ivf assign should not join:\n$p")
    assert(!p.contains("Window"), s"inline ivf assign should not window:\n$p")
  }

  test("trained IVF assignment broadcasts centroids and hash-aggregates the argmax") {
    // q_sim4 now assigns against kmeans-trained centroids: the centroid
    // side must broadcast (never shuffle the corpus) and the argmax must
    // stay a hash aggregation — no sort, no window
    val p = plan("q_sim4_ivf_assign")
    assert(p.contains("BroadcastNestedLoopJoin"), s"centroids should broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), p)
    assert(p.contains("HashAggregate"), s"argmax should hash, not sort:\n$p")
    assert(!p.contains("SortAggregate"), p)
    assert(!p.contains("Window"), p)
  }

  test("map-only minhash: no aggregate before the band join, fewer exchanges than relational") {
    val p = plan("q_d8_minhash_maponly")
    // the signature must be a projection feeding the generator — any
    // aggregate before the join means the kernel path regressed to the
    // relational explode+groupBy shape
    val joinIdx = p.indexOf("Join")
    assert(joinIdx >= 0, p)
    assert(!p.substring(joinIdx).contains("HashAggregate"),
      s"aggregation below the band join — kernel path regressed:\n$p")
    val exMap = "Exchange".r.findAllIn(p).size
    val exRel = "Exchange".r.findAllIn(plan("q_d3_minhash_lsh")).size
    assert(exMap < exRel,
      s"map-only path should shuffle less: $exMap vs relational $exRel")
  }

  test("native as-of join clusters both sides by key") {
    val p = plan("q_j6_asof_native")
    assert(p.contains("AsOfJoin "), p)
    assert(p.contains("hashpartitioning(user_id"), p)
    assert(p.contains("hashpartitioning(err_user"), p)
  }

  test("spread passes an already-parallel input through with no extra Exchange") {
    val target = spark.sparkContext.defaultParallelism
    val wide = spark.range(0, 1000, 1, target).toDF("id")
    // reference equality: the guard must not even touch the plan
    assert(graft.operators.Par.spread(wide) eq wide)
    val narrow = spark.range(0, 1000, 1, 1).toDF("id")
    val spreadNarrow = graft.operators.Par.spread(narrow)
    assert(spreadNarrow.rdd.getNumPartitions === target)
  }

  test("spread sees through localCheckpoint: narrow checkpoints respread, wide pass through") {
    val target = spark.sparkContext.defaultParallelism
    // a checkpointed frame's plan is a LogicalRDD leaf — before the
    // LogicalRDD case, spread() treated it as "too rich" and passed a
    // 1-partition checkpoint through untouched, serializing downstream
    // CPU-heavy work (e.g. Curation's checkpointed dedup survivors)
    val narrowCk = spark.range(0, 1000, 1, 1).toDF("id").localCheckpoint(true)
    assert(graft.operators.Par.spread(narrowCk).rdd.getNumPartitions === target)
    val wideCk = spark.range(0, 1000, 1, target).toDF("id").localCheckpoint(true)
    assert(graft.operators.Par.spread(wideCk) eq wideCk,
      "an already-parallel checkpoint must pass through untouched")
  }

  test("per-group sample aggregates with a bounded buffer — no window sort of every row") {
    val p = plan("q_x8_group_sample")
    assert(!p.contains("Window"), s"q_x8 regressed to a window sort:\n$p")
    assert(p.contains("ObjectHashAggregate") || p.contains("HashAggregate"),
      s"q_x8 should hash-aggregate:\n$p")
  }

  test("pq encode: the per-(vec,sub) argmax hashes — no sort-agg, no window") {
    val p = plan("q_pq2_encode")
    assert(!p.contains("SortAggregate"), s"PQ argmax fell back to a sort:\n$p")
    assert(!p.contains("Window"), s"PQ argmax regressed to a window:\n$p")
    assert(p.contains("HashAggregate") && p.contains("BroadcastHashJoin"), p)
  }

  test("repetition metrics and within-doc dedup never window-sort the token stream") {
    assert(!plan("q_x10_repetition").contains("Window"))
    assert(!plan("q_x11_within_doc_dedup").contains("Window"))
  }

  test("bloom decontamination: the might_contain prefilter sits in the plan") {
    val p = plan("q_d11_bloom_decontaminate")
    assert(p.contains("might_contain"), s"bloom prefilter missing:\n$p")
  }

  test("binned range join is an equi-join, never a nested loop") {
    val p = plan("q_j7_binned_range")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"range join fell back to a quadratic strategy:\n$p")
  }
}
