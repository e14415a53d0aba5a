package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup
import graft.streaming.EventStreams

/** The continuous ingest-dedup loop: per-batch classification against
  * prior batches' signatures, replay-idempotent store folds, and the
  * streaming wrapper — the nightly q_d12/q_d13 semantics moved to a
  * trigger cadence. */
class IngestDedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def dirs() = {
    val root = java.nio.file.Files.createTempDirectory("ingest-dedup")
    (s"$root/sigs", s"$root/out", s"$root/ckpt")
  }

  private val tA = "the quick brown fox jumps over the lazy dog again and again tonight"
  private val tB = "completely different text about distributed query engines and their many shuffling operators"
  private val tBnear = tB + " tonight" // the DedupClusterSpec high-Jaccard pattern
  private val tC = "a third unrelated document mentioning parquet sketches and boring metadata content"

  test("ingestBatch folds each batch's signatures for the next; statuses match the nightly loop") {
    import spark.implicits._
    val (sigs, out, _) = dirs()
    def ingest(id: Long, rows: Seq[(Long, String)]) =
      Dedup.ingestBatch(rows.toDF("doc_id", "text"), id, sigs, out,
        "text", "doc_id")
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // batch 0 against the not-yet-created store: everything kept
    assert(ingest(0L, Seq(1L -> tA, 2L -> tB)) ===
      Map(1L -> "kept", 2L -> "kept"))
    // batch 1: exact dup of A, near dup of B, one fresh doc
    assert(ingest(1L, Seq(10L -> tA, 11L -> tBnear, 12L -> tC)) ===
      Map(10L -> "exact_dup", 11L -> "near_dup", 12L -> "kept"))
    // batch 2: exact dup of batch-1's ACCEPTED doc — proves the fold;
    // near-dup of a REJECTED doc's text classifies near (vs B's sigs)
    assert(ingest(2L, Seq(20L -> tC, 21L -> tBnear)) ===
      Map(20L -> "exact_dup", 21L -> "near_dup"))
    // accepted output across batches = exactly the kept docs
    val accepted = spark.read.parquet(out)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(accepted === Set(1L, 2L, 12L))
    // the store holds signatures for accepted docs only
    val sigIds = spark.read.parquet(s"$sigs/bands")
      .select(col("sid")).distinct().collect().map(_.getLong(0)).toSet
    assert(sigIds === Set(1L, 2L, 12L))
  }

  test("a present-but-unreadable store FAILS the batch instead of classifying it as novel") {
    import spark.implicits._
    val (sigs, out, _) = dirs()
    // a store dir that exists but holds a corrupt (non-parquet) file is
    // NOT the missing-store case — silently treating it as empty would
    // fold every duplicate in the batch into the store permanently
    val bad = new java.io.File(s"$sigs/hashes/batch=0")
    bad.mkdirs()
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$bad/part-00000.parquet"), "not parquet")
    val batch = Seq(1L -> tA).toDF("doc_id", "text")
    val e = intercept[Exception] {
      Dedup.ingestBatch(batch, 1L, sigs, out, "text", "doc_id").collect()
    }
    assert(!e.isInstanceOf[java.io.FileNotFoundException])
  }

  test("a replayed batch rewrites its own partitions — store and output stay stable") {
    import spark.implicits._
    val (sigs, out, _) = dirs()
    def counts() = (
      spark.read.parquet(s"$sigs/hashes").count(),
      spark.read.parquet(s"$sigs/bands").count(),
      spark.read.parquet(out).count())
    Dedup.ingestBatch(Seq(1L -> tA, 2L -> tB).toDF("doc_id", "text"),
      0L, sigs, out, "text", "doc_id")
    val b1 = Seq(10L -> tA, 11L -> tC).toDF("doc_id", "text")
    val first = Dedup.ingestBatch(b1, 1L, sigs, out, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val after = counts()
    // the replay: same batch, same id — a crash between the output write
    // and the signature folds re-executes the whole step
    val replay = Dedup.ingestBatch(b1, 1L, sigs, out, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(replay === first,
      "replay must re-classify identically (its own signatures are excluded)")
    assert(counts() === after, "replay must not grow the store or the output")
  }

  test("property: any batch split of a dup-structured corpus matches the nightly loop") {
    import spark.implicits._
    // deterministic corpus with planted structure: bases, exact copies,
    // near-copies (append-token), unique tails — split into k batches by
    // a seed-shuffled assignment; the ingest loop must match the nightly
    // dedupAgainstStatus iteration on the same splits
    val bases = Seq(
      "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu",
      "one two three four five six seven eight nine ten eleven twelve",
      "red orange yellow green blue indigo violet ultra infra deep dark light")
    val docs: Seq[(Long, String)] =
      bases.zipWithIndex.map { case (t, i) => (i.toLong, t) } ++
      bases.zipWithIndex.map { case (t, i) => (100L + i, t) } ++          // exact dups
      bases.zipWithIndex.map { case (t, i) => (200L + i, t + " tonight") } ++ // near dups
      (0 until 3).map(i => (300L + i, s"unique document number $i with own words $i$i"))
    for (seed <- 0 until 4) {
      val rnd = new scala.util.Random(seed)
      val k = 2 + seed % 3
      val assign = docs.map(d => (d, rnd.nextInt(k)))
      val batches = (0 until k).map(b => assign.filter(_._2 == b).map(_._1))
        .filter(_.nonEmpty)
      val (sigs, out, _) = dirs()
      val viaIngest = batches.zipWithIndex.flatMap { case (b, id) =>
        Dedup.ingestBatch(b.toDF("doc_id", "text"), id.toLong, sigs, out,
          "text", "doc_id")
          .collect().map(r => r.getLong(0) -> r.getString(1))
      }.toMap
      // nightly reference: classify each batch against the ACCEPTED docs
      // of all prior batches, accumulate accepted
      var corpus = Seq.empty[(Long, String)]
      val viaNightly = batches.flatMap { b =>
        val status =
          if (corpus.isEmpty) b.map(_._1 -> "kept")
          else Dedup.dedupAgainstStatus(b.toDF("doc_id", "text"),
              corpus.toDF("doc_id", "text"), "text", "doc_id")
            .collect().map(r => r.getLong(0) -> r.getString(1)).toSeq
        val keptIds = status.filter(_._2 == "kept").map(_._1).toSet
        corpus = corpus ++ b.filter(d => keptIds.contains(d._1))
        status
      }.toMap
      assert(viaIngest === viaNightly,
        s"seed $seed (k=$k): ingest loop diverged from the nightly loop")
    }
  }

  test("streaming ingest dedup over micro-batches == the batch loop") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val (sigs, out, ckpt) = dirs()
    val input = MemoryStream[(Long, String)]
    val q = EventStreams.streamingIngestDedup(
      input.toDF().toDF("doc_id", "text"), sigs, out, ckpt)
    try {
      Seq(
        Seq(1L -> tA, 2L -> tB),
        Seq(10L -> tA, 11L -> tBnear, 12L -> tC),
        Seq(20L -> tC, 21L -> tBnear)
      ).foreach { b => input.addData(b); q.processAllAvailable() }
      val accepted = spark.read.parquet(out)
        .select(col("doc_id"), col("batch")).collect()
        .map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(accepted === Map(1L -> 0, 2L -> 0, 12L -> 1),
        "streamed acceptance must match the batch loop, batch-attributed")
    } finally q.stop()
  }
}
