package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, TextAnalysis}

/** Opt-out / right-to-be-forgotten purges across the persisted stores
  * (round-13: every store was append-only; purge folds OUT). The strong
  * contract proved here: a PURGED store is indistinguishable from a
  * store freshly built from the surviving docs — classification,
  * retrieval, and (for the bloom slices) the stored bytes themselves. */
class PurgeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val tA = "the quick brown fox jumps over the lazy dog again and again tonight"
  private val tB = "completely different text about distributed query engines and their many shuffling operators"
  private val tC = "a third unrelated document mentioning parquet sketches and boring metadata content"

  test("signature-store purge: accept -> purge -> a resubmitted copy " +
      "classifies kept; untouched docs still block; tombstones append") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("purge-sigs").toString
    val corpus = Seq((1L, tA), (2L, tB)).toDF("doc_id", "text")
    Dedup.writeCorpusSignatures(corpus, "text", "doc_id", dir)
    def classify(rows: Seq[(Long, String)]): Map[Long, String] =
      Dedup.dedupAgainstSignatures(rows.toDF("doc_id", "text"),
        dir, "text", "doc_id")
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // before the purge: both docs block their duplicates
    assert(classify(Seq(10L -> tA, 11L -> (tB + " tonight"))) ===
      Map(10L -> "exact_dup", 11L -> "near_dup"))
    // doc 1's owner revokes it — the request carries the payload
    Dedup.purgeSignatures(spark, dir, Seq((1L, tA)).toDF("doc_id", "text"),
      "text", "doc_id")
    // the purged doc no longer blocks anything — exact OR near
    assert(classify(Seq(10L -> tA, 12L -> (tA + " tonight"))) ===
      Map(10L -> "kept", 12L -> "kept"),
      "a purged doc must neither exact- nor near-classify new arrivals")
    // the surviving doc still protects its near-dups
    assert(classify(Seq(11L -> (tB + " tonight"))) === Map(11L -> "near_dup"))
    // purged store == store freshly built from the survivors
    val fresh = java.nio.file.Files.createTempDirectory("purge-fresh").toString
    Dedup.writeCorpusSignatures(Seq((2L, tB)).toDF("doc_id", "text"),
      "text", "doc_id", fresh)
    for (rel <- Seq("hashes", "bands", "shingles")) {
      val a = spark.read.parquet(s"$dir/$rel")
      val b = spark.read.parquet(s"$fresh/$rel")
      assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
        s"purged $rel must equal the survivor-built relation")
    }
    // tombstones audit; a re-run purge is an idempotent no-op
    assert(spark.read.parquet(s"$dir/tombstones")
      .collect().map(_.getLong(0)).toSeq === Seq(1L))
    Dedup.purgeSignatures(spark, dir, Seq((1L, tA)).toDF("doc_id", "text"),
      "text", "doc_id")
    assert(classify(Seq(10L -> tA)) === Map(10L -> "kept"))
    assert(spark.read.parquet(s"$dir/tombstones").count() === 2L,
      "every purge run appends its audit row")
  }

  test("contamination-store purge: slice-scoped bloom rebuild — " +
      "unaffected slices byte-identical, shared shingles survive, " +
      "purged store equals the survivor-built store") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("purge-bloom").toString
    val bench = Seq(
      (100L, tA),            // will be purged
      (101L, tB),            // stays
      (102L, tB + " extra")  // stays; SHARES tB's shingles with 101
    ).toDF("doc_id", "text")
    Dedup.writeContaminationStore(bench, "text", "doc_id", s"$root/store",
      slices = 8)
    val train = Seq((1L, tA + " tonight"), (2L, tB + " tonight"), (3L, tC))
      .toDF("doc_id", "text")
    val trainShing = Dedup.docShingles(train, "text", "doc_id")
    def shared(): Map[Long, Long] =
      Dedup.contaminationAgainstStore(trainShing, s"$root/store")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val before = shared()
    assert(before(1L) > 0L && before(2L) > 0L && before(3L) === 0L)
    val bloomsBefore = spark.read.parquet(s"$root/store/blooms")
      .collect().map(r => r.getInt(0) -> r.getAs[Array[Byte]](1).toSeq).toMap
    // the purge's slice-pruned rebuild scan: partition filters reach the
    // shingle store's slice partitions (the mechanism that makes the
    // rebuild slice-scoped instead of a store rescan)
    val pruned = spark.read.parquet(s"$root/store/shingles")
      .filter(col("slice").isin(0, 1))
      .queryExecution.executedPlan.toString
    assert(pruned.contains("PartitionFilters: [") &&
      pruned.replaceAll("(?s).*PartitionFilters: \\[", "")
        .takeWhile(_ != ']').contains("slice"),
      s"slice must prune as a partition filter:\n$pruned")
    Dedup.purgeContaminationStore(spark, s"$root/store",
      Seq(100L).toDF("doc_id"), "doc_id")
    val after = shared()
    assert(after(1L) === 0L,
      "the purged benchmark doc must stop flagging training text")
    assert(after(2L) === before(2L) && after(3L) === 0L,
      "surviving benchmark docs keep protecting exactly as before")
    // purged store == store freshly built from the survivors: shingles,
    // docs, and EVERY bloom row byte-for-byte (bloom insertion is
    // commutative bit-OR, so equal shingle sets give equal bytes)
    Dedup.writeContaminationStore(
      bench.filter(col("doc_id") =!= 100L), "text", "doc_id",
      s"$root/fresh", slices = 8)
    for (rel <- Seq("shingles", "docs")) {
      val a = spark.read.parquet(s"$root/store/$rel")
      val b = spark.read.parquet(s"$root/fresh/$rel")
      assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
        s"purged $rel must equal the survivor-built relation")
    }
    val bloomsAfter = spark.read.parquet(s"$root/store/blooms")
      .collect().map(r => r.getInt(0) -> r.getAs[Array[Byte]](1).toSeq).toMap
    val bloomsFresh = spark.read.parquet(s"$root/fresh/blooms")
      .collect().map(r => r.getInt(0) -> r.getAs[Array[Byte]](1).toSeq).toMap
    assert(bloomsAfter === bloomsFresh,
      "every purged-store bloom row must equal the survivor-built one")
    // slices untouched by the purge carried over byte-identical
    val untouched = bloomsAfter.keySet.filter(s =>
      bloomsBefore.get(s) == bloomsAfter.get(s))
    assert(untouched.nonEmpty,
      "fixture regression: every slice was affected — widen `slices`")
    // shared shingles survive: 101/102 both carry tB's shingles, so
    // purging ONE of them must not remove them
    Dedup.purgeContaminationStore(spark, s"$root/store",
      Seq(102L).toDF("doc_id"), "doc_id")
    assert(shared()(2L) === before(2L),
      "a shingle still referenced by a surviving doc must stay protected")
  }

  test("contamination-store crash debris: purge entry sweeps staged/" +
      "retired leaf dirs — partition inference stays INT and an " +
      "interrupted swap's leaf comes back") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("purge-crash").toString
    val bench = Seq((100L, tA), (101L, tB), (102L, tC)).toDF("doc_id", "text")
    Dedup.writeContaminationStore(bench, "text", "doc_id", s"$root/store",
      slices = 4)
    val shinglesBefore = spark.read.parquet(s"$root/store/shingles")
      .collect().map(r => (r.getString(0), r.getInt(1))).toSet
    val shingles = new java.io.File(s"$root/store/shingles")
    val leaves = shingles.listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("slice="))
      .map(_.getName).sorted
    assert(leaves.length >= 2, "fixture needs at least two slice leaves")
    // crash state A: a LEGACY bare-suffix staged dir (pre-hidden-staging
    // build) — visible to partition inference, it would widen `slice` to
    // string on any parent-level read
    val junk = new java.io.File(shingles, s"${leaves.head}.rewriting")
    java.nio.file.Files.createDirectory(junk.toPath)
    new java.io.File(shingles, leaves.head).listFiles().foreach { f =>
      java.nio.file.Files.copy(f.toPath,
        new java.io.File(junk, f.getName).toPath); ()
    }
    // crash state B: a swap interrupted between its two renames — the
    // live leaf is GONE, only the hidden retired sibling remains
    val victim = leaves.last
    assert(new java.io.File(shingles, victim).renameTo(
      new java.io.File(shingles, s".$victim.retired")))
    // an unknown-id purge is a data no-op, but its entry sweep must heal
    // BOTH crash states before any parent-level read
    Dedup.purgeContaminationStore(spark, s"$root/store",
      Seq(999L).toDF("doc_id"), "doc_id")
    val healed = spark.read.parquet(s"$root/store/shingles")
    assert(healed.schema("slice").dataType ===
      org.apache.spark.sql.types.IntegerType,
      "crash debris must never widen the partition column")
    assert(healed.collect().map(r => (r.getString(0), r.getInt(1))).toSet
      === shinglesBefore,
      "the interrupted leaf's rows must come back, the junk dir's must not")
    assert(!junk.exists(), "stale legacy staged dir must be swept")
    assert(!new java.io.File(shingles, s".$victim.retired").exists())
    assert(new java.io.File(shingles, victim).isDirectory,
      "the interrupted swap's leaf must be restored under its real name")
  }

  test("contamination-store purge fails fast on a store predating the " +
      "docs bookkeeping instead of a raw missing-path read") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("purge-old").toString
    Dedup.writeContaminationStore(Seq((1L, tA)).toDF("doc_id", "text"),
      "text", "doc_id", s"$root/store", slices = 2)
    def rmrf(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rmrf)
      f.delete(); ()
    }
    rmrf(new java.io.File(s"$root/store/docs")) // simulate the old layout
    val ex = intercept[IllegalArgumentException](
      Dedup.purgeContaminationStore(spark, s"$root/store",
        Seq(1L).toDF("doc_id"), "doc_id"))
    assert(ex.getMessage.contains("rebuild it with writeContaminationStore"),
      "old-layout stores must be refused with a rebuild instruction")
  }

  test("LM count-store purges: subtraction is lossless — the purged " +
      "store scores identically to a survivor-trained one; a bogus " +
      "request (unknown doc) raises instead of going negative") {
    import spark.implicits._
    import graft.operators.TextAnalysis
    val root = java.nio.file.Files.createTempDirectory("purge-lm").toString
    val d1 = (1L, tA); val d2 = (2L, tB); val d3 = (3L, tC)
    val all = Seq(d1, d2, d3).toDF("doc_id", "text")
    val survivors = Seq(d2, d3).toDF("doc_id", "text")
    val target = Seq((10L, tA), (11L, tB + " tonight"), (12L, "brand new words"))
      .toDF("doc_id", "text")
    // ---- add-alpha store ----
    TextAnalysis.writeLmCounts(all, "text", s"$root/lm")
    TextAnalysis.purgeLmCounts(spark, s"$root/lm",
      Seq(d1).toDF("doc_id", "text"))
    TextAnalysis.writeLmCounts(survivors, "text", s"$root/lm_fresh")
    for (rel <- Seq("bigrams", "unigrams", "stats")) {
      val a = spark.read.parquet(s"$root/lm/$rel")
      val b = spark.read.parquet(s"$root/lm_fresh/$rel")
      assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
        s"purged lm/$rel must equal the survivor-trained relation")
    }
    val sa = TextAnalysis.bigramPerplexityFromLm(spark, s"$root/lm",
      target, "text", "doc_id", 20.0, 40.0)
    val sb = TextAnalysis.bigramPerplexityFromLm(spark, s"$root/lm_fresh",
      target, "text", "doc_id", 20.0, 40.0)
    assert(sa.exceptAll(sb).isEmpty && sb.exceptAll(sa).isEmpty,
      "scoring through the purged store must be byte-identical")
    // ---- KN store: derived relations rebuild from post-purge bigrams ----
    TextAnalysis.writeKnCounts(all, "text", s"$root/kn")
    TextAnalysis.purgeKnCounts(spark, s"$root/kn",
      Seq(d1).toDF("doc_id", "text"))
    TextAnalysis.writeKnCounts(survivors, "text", s"$root/kn_fresh")
    for (rel <- Seq("bigrams", "contexts", "continuations", "disc")) {
      val a = spark.read.parquet(s"$root/kn/$rel")
      val b = spark.read.parquet(s"$root/kn_fresh/$rel")
      assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
        s"purged kn/$rel must equal the survivor-trained relation")
    }
    val ka = TextAnalysis.knBigramNllFromStore(spark, s"$root/kn",
      target, "text", "doc_id")
    val kb = TextAnalysis.knBigramNllFromStore(spark, s"$root/kn_fresh",
      target, "text", "doc_id")
    assert(ka.exceptAll(kb).isEmpty && kb.exceptAll(ka).isEmpty)
    // ---- KN-trigram store: the continuation rung rebuilds too ----
    TextAnalysis.writeKn3Counts(all, "text", s"$root/kn3")
    TextAnalysis.purgeKn3Counts(spark, s"$root/kn3",
      Seq(d1).toDF("doc_id", "text"))
    TextAnalysis.writeKn3Counts(survivors, "text", s"$root/kn3_fresh")
    for (rel <- Seq("trigrams", "contexts", "midcounts", "middles",
        "continuations", "disc")) {
      val a = spark.read.parquet(s"$root/kn3/$rel")
      val b = spark.read.parquet(s"$root/kn3_fresh/$rel")
      assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
        s"purged kn3/$rel must equal the survivor-trained relation")
    }
    val t3a = TextAnalysis.knTrigramNllFromStore(spark, s"$root/kn3",
      target, "text", "doc_id")
    val t3b = TextAnalysis.knTrigramNllFromStore(spark, s"$root/kn3_fresh",
      target, "text", "doc_id")
    assert(t3a.exceptAll(t3b).isEmpty && t3b.exceptAll(t3a).isEmpty)
    val ex3 = intercept[Exception](TextAnalysis.purgeKn3Counts(spark,
      s"$root/kn3", Seq((9L, tB), (9L, tB)).toDF("doc_id", "text")))
    assert(ex3.getMessage.contains("never absorbed"))
    // tombstones carry the revoked text hashes
    assert(spark.read.parquet(s"$root/kn/tombstones").count() === 1L)
    // a request claiming MORE occurrences than the store holds (here:
    // the same doc twice) must raise, not clamp to a negative count
    val ex = intercept[Exception](TextAnalysis.purgeLmCounts(spark,
      s"$root/lm", Seq((9L, tB), (9L, tB)).toDF("doc_id", "text")))
    assert(ex.getMessage.contains("never absorbed"),
      "over-subtraction must fail loudly — a silently-negative count " +
        "is a quietly wrong model")
    // ...and the failed rewrite must not have corrupted the store: the
    // staged-swap discipline leaves the original relation intact
    val after = TextAnalysis.bigramPerplexityFromLm(spark, s"$root/lm",
      target, "text", "doc_id", 20.0, 40.0)
    assert(after.exceptAll(sb).isEmpty && sb.exceptAll(after).isEmpty,
      "a refused purge must leave the store exactly as it was")
  }

  test("a signature store purged to EMPTY stays operational: everything " +
      "classifies kept, and the nightly fold-in resumes normally") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("purge-empty").toString
    val corpus = Seq((1L, tA), (2L, tB)).toDF("doc_id", "text")
    Dedup.writeCorpusSignatures(corpus, "text", "doc_id", dir)
    // revoke EVERYTHING the store ever held
    Dedup.purgeSignatures(spark, dir, corpus, "text", "doc_id")
    def classify(rows: Seq[(Long, String)]): Map[Long, String] =
      Dedup.dedupAgainstSignatures(rows.toDF("doc_id", "text"),
        dir, "text", "doc_id")
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(classify(Seq(10L -> tA, 11L -> tB)) ===
      Map(10L -> "kept", 11L -> "kept"),
      "an emptied store must classify, not crash — and keep everything")
    // the loop resumes: fold the re-accepted batch in, and it protects
    val batch = Seq((10L, tA)).toDF("doc_id", "text")
    Dedup.appendBatchSignatures(batch, batch.select(col("doc_id")),
      "text", "doc_id", dir)
    assert(classify(Seq(20L -> tA)) === Map(20L -> "exact_dup"),
      "fold-in after a full purge must work exactly like day one")
  }

  test("bm25-index purge: the revoked doc can never be retrieved again " +
      "and the purged index scores identically to a survivor-built one") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("purge-bm25").toString
    val docs = Seq((1L, tA), (2L, tB), (3L, tC)).toDF("doc_id", "text")
    TextAnalysis.writeBm25Index(docs, "text", "doc_id", s"$root/idx")
    val q = Seq((1, Seq("quick", "fox")), (2, Seq("parquet", "metadata")))
    def hits(dir: String): Set[(Int, Long)] =
      TextAnalysis.bm25TopKFromIndex(spark, dir, q, k = 3)
        .select(col("query_id"), col("doc_id")).collect()
        .map(r => (r.getInt(0), r.getLong(1))).toSet
    assert(hits(s"$root/idx").contains((1, 1L)))
    TextAnalysis.purgeBm25Index(spark, s"$root/idx", Seq(1L).toDF("doc_id"))
    val after = hits(s"$root/idx")
    assert(!after.exists(_._2 == 1L),
      "a purged doc must never surface from the index again")
    assert(after.contains((2, 3L)), "surviving docs still retrieve")
    // scores (not just ids) equal a survivor-built index: stats were
    // recomputed exactly, df re-derives from the purged postings
    TextAnalysis.writeBm25Index(docs.filter(col("doc_id") =!= 1L),
      "text", "doc_id", s"$root/fresh")
    val a = TextAnalysis.bm25TopKFromIndex(spark, s"$root/idx", q, k = 3)
    val b = TextAnalysis.bm25TopKFromIndex(spark, s"$root/fresh", q, k = 3)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      "purged index must score byte-identically to the survivor index")
    assert(spark.read.parquet(s"$root/idx/tombstones")
      .collect().map(_.getLong(0)).toSeq === Seq(1L))
  }
}
