package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

class DedupClusterSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def components(pairs: Seq[(Long, Long)], maxIter: Int = 20): Map[Long, Long] = {
    import spark.implicits._
    Dedup.connectedComponents(pairs.toDF("a_id", "b_id"), maxIter)
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

  test("convergence on exactly the maxIter-th round passes via the confirming round") {
    import spark.implicits._
    // a path graph needs several propagation rounds; find the exact number
    // empirically, then assert the boundary: maxIter == exact passes (the
    // final productive round leaves changed > 0, which only a confirming
    // extra round can bless), maxIter == exact - 1 throws
    val pairs = (0L until 7L).map(i => (i, i + 1))
    val exact = (1 to 20).find { m =>
      scala.util.Try(components(pairs, maxIter = m)).isSuccess
    }.get
    assert(exact > 1, "path graph must need more than one round for this test to bite")
    val got = components(pairs, maxIter = exact)
    assert(got.values.toSet === Set(0L))
    val ex = intercept[IllegalArgumentException](components(pairs, maxIter = exact - 1))
    assert(ex.getMessage.contains("did not converge"))
  }

  test("verified pipeline: LSH false positives are rescored out before clustering") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val shing = Dedup.docShingles(docs, "text", "doc_id")
    val cand = Dedup.minhashCandidates(
      Dedup.docShingles(docs, "text", "doc_id", distinct = false), 8, 2)
      .select(col("a_id"), col("b_id")).distinct()
    val verified = Dedup.jaccardForPairs(cand, shing, thresholdTenths = 1)
    val nCand = cand.count()
    val nVer = verified.count()
    info(s"$nCand LSH candidates, $nVer survive exact Jaccard >= 0.1")
    assert(nVer < nCand,
      "the corpus should contain at least one chance band collision " +
        "below the Jaccard threshold — otherwise this test can't prove " +
        "the rescore stage does anything")

    // a specific false positive: candidates whose exact Jaccard fails the
    // threshold must not end up in the same component
    val falsePos = cand.join(
      verified.select(col("a_id"), col("b_id")), Seq("a_id", "b_id"),
      "left_anti").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(falsePos.nonEmpty)
    val comp = Dedup.verifiedClusters(docs, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val raw = Dedup.connectedComponents(cand)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // every candidate edge puts its pair in one raw component; a false
    // positive may still share a VERIFIED component via genuine paths, so
    // the proof of exclusion is: at least one rescored-out pair that raw
    // clustering merged is separated (or absent) after verification
    val separated = falsePos.count { case (a, b) =>
      assert(raw.get(a).isDefined && raw.get(a) == raw.get(b),
        s"candidate edge ($a,$b) must merge its endpoints in raw CC")
      !(comp.contains(a) && comp.get(a) == comp.get(b))
    }
    info(s"${falsePos.length} false-positive candidates, $separated separated after rescore")
    assert(separated > 0,
      "no false-positive pair was split — the rescore stage changed nothing")
    // and the pipeline still finds real clusters
    assert(comp.nonEmpty)
  }

  test("incremental dedup: exact, near, and kept branches all classify correctly") {
    import spark.implicits._
    val base = "the quick brown fox jumps over a lazy dog near the old stone bridge"
    val existing = Seq(
      (100L, base),
      (101L, "completely different words about spark query engines and shuffles here")
    ).toDF("doc_id", "text")
    val incoming = Seq(
      (1L, base),                                   // exact duplicate of 100
      (2L, base + " tonight"),                      // near-dup of 100 (high Jaccard)
      (3L, "unrelated text mentioning databases columns rows and very boring metadata content")
    ).toDF("doc_id", "text")
    val got = Dedup.dedupAgainstStatus(incoming, existing, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(1L -> "exact_dup", 2L -> "near_dup", 3L -> "kept"))
  }

  test("signature-based incremental dedup matches the text-based path and never scans existing text") {
    import spark.implicits._
    val base = "the quick brown fox jumps over a lazy dog near the old stone bridge"
    val tmp = java.nio.file.Files.createTempDirectory("graft_sig_spec_").toString
    // land existing docs in their OWN parquet file so a scan of it (the
    // thing the signature path must never do) is visible by path
    Seq(
      (100L, base),
      (101L, "completely different words about spark query engines and shuffles here")
    ).toDF("doc_id", "text").write.parquet(s"$tmp/existing_docs")
    val existing = spark.read.parquet(s"$tmp/existing_docs")
    val incoming = Seq(
      (1L, base),
      (2L, base + " tonight"),
      (3L, "unrelated text mentioning databases columns rows and very boring metadata content")
    ).toDF("doc_id", "text")
    Dedup.writeCorpusSignatures(existing, "text", "doc_id", s"$tmp/sigs")
    val viaSigs = Dedup.dedupAgainstSignatures(incoming, s"$tmp/sigs", "text", "doc_id")
    assert(viaSigs.collect().map(r => r.getLong(0) -> r.getString(1)).toMap ===
      Map(1L -> "exact_dup", 2L -> "near_dup", 3L -> "kept"))
    // output equality with the text-based path on the same fixture
    val viaText = Dedup.dedupAgainstStatus(incoming, existing, "text", "doc_id")
    assert(viaSigs.exceptAll(viaText).isEmpty && viaText.exceptAll(viaSigs).isEmpty)
    // the plan reads the three signature relations, never the corpus text
    val p = viaSigs.queryExecution.executedPlan.toString
    assert(p.contains("sigs/hashes") && p.contains("sigs/bands") &&
      p.contains("sigs/shingles"), s"signature relations missing from plan:\n$p")
    assert(!p.contains("existing_docs"),
      s"the existing corpus was re-scanned — the persisted signatures exist " +
        s"precisely so this never happens:\n$p")
  }

  test("bloom-store contamination matches the in-memory report and never scans benchmark text") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_bloomstore_spec_").toString
    val base = "the quick brown fox jumps over a lazy dog near the old stone bridge"
    // benchmark docs land in their OWN parquet file so a score-time scan
    // of it (the thing the store exists to prevent) is visible by path
    Seq(
      (100L, base),
      (101L, "held out benchmark prose about evaluation suites and leakage risks today")
    ).toDF("doc_id", "text").write.parquet(s"$tmp/bench_docs")
    val bench = spark.read.parquet(s"$tmp/bench_docs")
    val train = Seq(
      (1L, base + " tonight"),
      (2L, "unrelated training text mentioning databases columns rows and boring metadata")
    ).toDF("doc_id", "text")
    val trainShing = Dedup.docShingles(train, "text", "doc_id")
    Dedup.writeContaminationStore(bench, "text", "doc_id", s"$tmp/store")
    val viaStore = Dedup.contaminationAgainstStore(trainShing, s"$tmp/store")
    // output equality with the in-memory exact report on the same fixture
    val inMem = Dedup.contaminationReport(
      trainShing, Dedup.docShingles(bench, "text", "doc_id"))
    assert(viaStore.exceptAll(inMem).isEmpty && inMem.exceptAll(viaStore).isEmpty)
    // doc 1 shares the overlapping base shingles; doc 2 shares none
    val byId = viaStore.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byId(1L) > 0L && byId(2L) === 0L)
    // the score plan reads the store relations, never the benchmark text
    val p = viaStore.queryExecution.executedPlan.toString
    assert(p.contains("store/shingles"), s"stored shingles missing from plan:\n$p")
    assert(!p.contains("bench_docs"),
      s"the benchmark corpus was re-scanned — the store exists precisely " +
        s"so this never happens:\n$p")
  }

  test("bloom-store slices merge: multi-slice store equals single-slice store") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_bloomslices_").toString
    val bench = Seq(
      (100L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (101L, "one two three four five six seven eight nine ten")
    ).toDF("doc_id", "text")
    val trainShing = Dedup.docShingles(Seq(
      (1L, "gamma delta epsilon zeta eta theta plus new trailing words"),
      (2L, "three four five six seven different tail tokens here"),
      (3L, "nothing in common with either benchmark document at all")
    ).toDF("doc_id", "text"), "text", "doc_id")
    Dedup.writeContaminationStore(bench, "text", "doc_id", s"$tmp/s1", slices = 1)
    Dedup.writeContaminationStore(bench, "text", "doc_id", s"$tmp/s4", slices = 4)
    // identical geometry per slice means read-time mergeInPlace must
    // reproduce the single-filter behavior bit-for-bit
    val one = Dedup.contaminationAgainstStore(trainShing, s"$tmp/s1")
    val four = Dedup.contaminationAgainstStore(trainShing, s"$tmp/s4")
    assert(one.exceptAll(four).isEmpty && four.exceptAll(one).isEmpty)
    assert(spark.read.parquet(s"$tmp/s4/blooms").count() > 1L,
      "the 4-slice store should actually hold multiple bloom rows")
  }

  test("bloom-store empty benchmark degenerates to the all-zero report") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_bloomempty_").toString
    val bench = Seq.empty[(Long, String)].toDF("doc_id", "text")
    Dedup.writeContaminationStore(bench, "text", "doc_id", s"$tmp/store")
    val trainShing = Dedup.docShingles(
      Seq((1L, "some training words that overlap nothing because nothing exists"))
        .toDF("doc_id", "text"), "text", "doc_id")
    val got = Dedup.contaminationAgainstStore(trainShing, s"$tmp/store").collect()
    assert(got.length === 1)
    assert(got.head.getLong(1) === 0L && got.head.getDouble(3) === 0.0)
  }

  test("non-default shingleK threads through the whole signature path (regression)") {
    import spark.implicits._
    // the rescore must shingle the batch at the SAME k the store was
    // written with — a dropped k (the bug this pins) intersects 5-gram
    // store shingles with 3-gram batch shingles and misses every near-dup
    val tmp = java.nio.file.Files.createTempDirectory("graft-k5").toString
    val base = "the quick brown fox jumps over the lazy dog again and again tonight"
    val corpus = Seq((100L, base)).toDF("doc_id", "text")
    Dedup.writeCorpusSignatures(corpus, "text", "doc_id", s"$tmp/sigs", shingleK = 5)
    val batch = Seq((1L, base + " ok"), (2L, "totally unrelated words about joins")).toDF("doc_id", "text")
    val viaSigs = Dedup.dedupAgainstSignatures(batch, s"$tmp/sigs", "text", "doc_id", shingleK = 5)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(viaSigs === Map(1L -> "near_dup", 2L -> "kept"))
    val viaText = Dedup.dedupAgainstStatus(batch, corpus, "text", "doc_id", shingleK = 5)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(viaText === viaSigs)
  }

  test("nightly loop: accepted batch signatures append, next batch sees them") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-nightly").toString
    val base = "the quick brown fox jumps over the lazy dog again and again tonight"
    val novel1 = "completely different words about spark query engines and shuffles here"
    val novel2 = "unrelated text mentioning databases columns rows and very boring metadata content"
    val corpus = Seq((100L, base)).toDF("doc_id", "text")
    Dedup.writeCorpusSignatures(corpus, "text", "doc_id", s"$tmp/sigs")

    // batch 1: one exact dup of the corpus, two novel docs
    val batch1 = Seq((1L, base), (2L, novel1), (3L, novel2)).toDF("doc_id", "text")
    val st1 = Dedup.dedupAgainstSignatures(batch1, s"$tmp/sigs", "text", "doc_id")
    assert(st1.collect().map(r => r.getLong(0) -> r.getString(1)).toMap ===
      Map(1L -> "exact_dup", 2L -> "kept", 3L -> "kept"))
    Dedup.appendBatchSignatures(batch1,
      st1.filter(col("status") === "kept"), "text", "doc_id", s"$tmp/sigs")

    // batch 2 classifies against corpus ∪ batch-1-accepted: an exact copy
    // of a batch-1 doc, a near-dup of another, and a novel doc
    val batch2 = Seq(
      (11L, novel1),              // exact dup of doc 2 — only visible via the append
      (12L, novel2 + " tonight"), // near-dup of doc 3
      (13L, "fresh sentences on benchmarking columnar layouts under heavy concurrency today")
    ).toDF("doc_id", "text")
    val st2 = Dedup.dedupAgainstSignatures(batch2, s"$tmp/sigs", "text", "doc_id")
    assert(st2.collect().map(r => r.getLong(0) -> r.getString(1)).toMap ===
      Map(11L -> "exact_dup", 12L -> "near_dup", 13L -> "kept"))
  }

  test("soft dedup weights: cluster members split one doc's weight, " +
      "singletons and pair-less docs keep the full 1e6") {
    import spark.implicits._
    // docs 1-3 identical (one 3-member cluster -> 333333 each);
    // 4 similar to nothing; 5 too short for any shingle at all
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"),
      (3L, "alpha beta gamma delta epsilon zeta"),
      (4L, "one two three four five six seven"),
      (5L, "hi")
    ).toDF("doc_id", "text")
    val got = Dedup.softDedupWeights(docs, "text", "doc_id")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got === Map(
      1L -> ((1L, 3L, 333333L)), 2L -> ((1L, 3L, 333333L)),
      3L -> ((1L, 3L, 333333L)),
      4L -> ((4L, 1L, 1000000L)), 5L -> ((5L, 1L, 1000000L))))
  }

  test("containment: a quoted doc hits C=1.0 where Jaccard misses; " +
      "threshold cuts integer-exactly") {
    import spark.implicits._
    // doc 2 = the first 4 tokens of doc 1 → its 2 shingles are all in
    // doc 1's 8: C = 2/2 = 1.0 while J = 2/8 = 0.25 (Jaccard at 0.8
    // would never flag this pair). doc 3 shares exactly 1 of its 2
    // shingles with doc 4 → C = 0.5, below the 0.8 cut.
    val docs = Seq(
      (1L, "a b c d e f g h i j"),
      (2L, "a b c d"),
      (3L, "p q r s"),
      (4L, "q r s t")
    ).toDF("doc_id", "text")
    val got = Dedup.containmentPairs(
        Dedup.docShingles(docs, "text", "doc_id"), 8)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    assert(got === Map((1L, 2L) -> ((2L, 8L, 2L, 1.0))))
    // at thresholdTenths=5 the (3,4) pair appears with C = 0.5
    val loose = Dedup.containmentPairs(
        Dedup.docShingles(docs, "text", "doc_id"), 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(loose === Set((1L, 2L), (3L, 4L)))
  }

  test("span dedup: first occurrence wins, redundant docs vanish, order preserved") {
    import spark.implicits._
    // window=2 spans: doc 1 = [a b][c d][e f]; doc 2 repeats [c d] and
    // adds [x y]; doc 3 is entirely doc-1 spans → vanishes; doc 4 has a
    // 3-token tail (ragged last span [q] survives independently)
    val docs = Seq(
      (1L, "a b c d e f"),
      (2L, "c d x y"),
      (3L, "a b e f"),   // spans [a b][e f] — both already in doc 1
      (4L, "n m q")      // spans [n m][q]
    ).toDF("doc_id", "text")
    val got = Dedup.spanDedup(docs, "text", "doc_id", window = 2)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(got === Map(
      1L -> (("a b c d e f", 3L)),
      2L -> (("x y", 1L)),
      4L -> (("n m q", 2L))))
  }

  test("substring dedup: variable-length repeats removed wherever they start") {
    import spark.implicits._
    // minLen=3. doc 2 repeats doc 1's "c d e f" (4 tokens — LONGER than
    // minLen, at an arbitrary offset, no grid anywhere); doc 3 is
    // entirely a repeat; doc 4 is shorter than minLen (untouchable);
    // doc 5 repeats its own leading "m n o" twice more (within-doc,
    // run-length 6 — the coverage union removes the whole tail)
    val docs = Seq(
      (1L, "a b c d e f g"),
      (2L, "x y c d e f z"),
      (3L, "c d e"),
      (4L, "p q"),
      (5L, "m n o m n o m n o"),
      (6L, null.asInstanceOf[String]),
      (7L, "")
    ).toDF("doc_id", "text")
    val got = Dedup.substringDedup(docs, "text", "doc_id", minLen = 3)
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got === Map(
      1L -> (("a b c d e f g", 7L, 0L)),  // first occurrences keep all
      2L -> (("x y z", 3L, 4L)),          // exactly "c d e f" removed
      3L -> (("", 0L, 3L)),               // fully-covered doc stays, empty
      4L -> (("p q", 2L, 0L)),            // below minLen: no anchors
      5L -> (("m n o", 3L, 6L))))         // self-repeat tail removed
  }

  test("paragraph dedup: shared banner survives only in the first doc; " +
      "within-doc repeats drop; empty paragraphs neither dedupe nor count") {
    import spark.implicits._
    val docs = Seq(
      (1L, "unique one\nshared banner\nunique two"),
      (2L, "shared banner\nanother paragraph"),       // banner seen in doc 1
      (3L, "twin\n\ntwin\nlast"),                     // within-doc repeat + empty
      (4L, "shared banner"),                          // fully covered -> empty
      (5L, null.asInstanceOf[String]),                // drops out
      (6L, "\n\n")                                    // only empties: drops out
    ).toDF("doc_id", "text")
    val out = graft.operators.Dedup.paragraphDedup(docs, "text", "doc_id")
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(out(1L) === (("unique one\nshared banner\nunique two", 3L, 0L)))
    assert(out(2L) === (("another paragraph", 1L, 1L)))
    assert(out(3L) === (("twin\nlast", 2L, 1L)), "second twin drops, empty line ignored")
    assert(out(4L) === (("", 0L, 1L)), "fully-deduped doc stays with empty text")
    assert(out.size === 4, "null-text and empty-only docs drop out")
  }

  test("span dedup: identical docs keep only the lowest-id copy") {
    import spark.implicits._
    val docs = Seq((7L, "p q r s"), (5L, "p q r s"), (9L, "p q r s"))
      .toDF("doc_id", "text")
    val got = Dedup.spanDedup(docs, "text", "doc_id", window = 4)
      .collect().map(r => (r.getLong(0), r.getString(1))).toList
    assert(got === List((5L, "p q r s")))
  }

  test("span dedup edges: window beyond doc length, null/empty text dropped") {
    import spark.implicits._
    // window larger than every doc → whole-doc spans → exact keep-first
    val docs = Seq((1L, "a b"), (2L, "a b"), (3L, "c"),
      (4L, null.asInstanceOf[String]), (5L, ""))
      .toDF("doc_id", "text")
    val got = Dedup.spanDedup(docs, "text", "doc_id", window = 100)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // null/empty-text docs have no spans and drop out rather than throw
    assert(got === Map(1L -> "a b", 3L -> "c"))
  }

  test("boilerplate scrub: hot spans leave EVERY doc, empty docs survive") {
    import spark.implicits._
    // window=2, minDocFreq=2: [c d] is in docs 1/2/3 → boilerplate,
    // scrubbed everywhere INCLUDING its first occurrence (the rule that
    // separates this from spanDedup); doc 3 is nothing but boilerplate
    // and must come back empty, not vanish; doc 4 is untouched.
    val docs = Seq(
      (1L, "a b c d e f"),
      (2L, "c d x y"),
      (3L, "c d"),
      (4L, "n m q")
    ).toDF("doc_id", "text")
    val got = Dedup.boilerplateScrub(docs, "text", "doc_id",
        window = 2, minDocFreq = 2)
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got === Map(
      1L -> (("a b e f", 2L, 1L)),
      2L -> (("x y", 1L, 1L)),
      3L -> (("", 0L, 1L)),
      4L -> (("n m q", 2L, 0L))))
    // threshold below 2 is a config error, not a silent full scrub
    assert(intercept[IllegalArgumentException](
      Dedup.boilerplateScrub(docs, "text", "doc_id", 2, 1))
      .getMessage.contains("minDocFreq"))
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

  test("leakage-safe split: a near-dup cluster can NEVER straddle splits") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val out = Dedup.leakageSafeSplit(docs, "text", "doc_id",
      salt = "exp1", trainPct = 90, valPct = 5)
    // one row per input doc
    assert(out.count() === docs.count())
    // the defining invariant: every cluster maps to exactly one split
    val straddling = out.groupBy(col("cluster"))
      .agg(countDistinct(col("split")).as("ns"))
      .filter(col("ns") > 1).count()
    assert(straddling === 0, "a cluster straddled splits — the eval leak")
    // non-trivial: at least one multi-doc cluster exists in the fixture,
    // and its members moved TOGETHER relative to the per-doc hash split
    val multi = out.groupBy(col("cluster")).agg(count(lit(1)).as("k"))
      .filter(col("k") > 1).count()
    assert(multi > 0, "fixture must contain at least one near-dup cluster")
    // singletons split exactly like the plain per-doc hash split
    import graft.operators.Sampling
    val singles = out.groupBy(col("cluster")).agg(count(lit(1)).as("k"))
      .filter(col("k") === 1).select(col("cluster"))
    val diff = out.join(singles, Seq("cluster"), "left_semi")
      .withColumn("plain",
        Sampling.splitLabel(col("doc_id"), "exp1", 90, 5))
      .filter(col("split") =!= col("plain")).count()
    assert(diff === 0, "singletons must match the plain hash split")
  }

  test("canonicalByScore: the cluster argmax wins (ties to the lower " +
      "id), unscored docs lose contested clusters but keep their own " +
      "singletons, negative scores still beat missing ones") {
    import spark.implicits._
    val docs = Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L).toDF("doc_id")
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 1L), (6L, 6L), (7L, 6L))
      .toDF("node", "component")
    val scores = Seq((1L, Option(100L)), (2L, Option(300L)),
      (3L, Option(300L)), (4L, Option(50L)), (5L, Option.empty[Long]),
      (6L, Option.empty[Long]), (7L, Option(-5L)))
      .toDF("doc_id", "q")
    val out = graft.operators.Dedup.canonicalByScore(
        docs, "doc_id", clusters, scores, "q")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(4), r.getBoolean(5))))
      .toMap
    assert(out.size === 7, "every input doc gets exactly one row")
    // cluster 1: 300-tie between 2 and 3 resolves to the LOWER id
    assert(out(2L) === ((1L, 3L, 2L, true)))
    assert(out(1L)._4 === false && out(3L)._4 === false)
    // singletons canonicalize themselves — even unscored ones
    assert(out(4L) === ((4L, 1L, 4L, true)))
    assert(out(5L) === ((5L, 1L, 5L, true)))
    // a NEGATIVE score still beats a missing one in a contested cluster
    assert(out(7L) === ((6L, 2L, 7L, true)) && out(6L)._4 === false)
  }

  test("canonicalByScore: a score below any sentinel floor still beats " +
      "a missing one (explicit is-unscored field, not a floor); " +
      "Long.MinValue trips the negation guard") {
    import spark.implicits._
    val docs = Seq(1L, 2L).toDF("doc_id")
    val clusters = Seq((1L, 1L), (2L, 1L)).toDF("node", "component")
    // -2e15 is BELOW the old -1e15 sentinel — under a floor it would
    // have lost to the unscored doc 2
    val scores = Seq((1L, Option(-2000000000000000L)),
      (2L, Option.empty[Long])).toDF("doc_id", "q")
    val out = graft.operators.Dedup.canonicalByScore(
        docs, "doc_id", clusters, scores, "q")
      .collect().map(r => r.getLong(0) -> r.getBoolean(5)).toMap
    assert(out(1L) === true && out(2L) === false,
      "a tiny-but-present score must outrank a missing one")
    val minScores = Seq((1L, Long.MinValue), (2L, 0L)).toDF("doc_id", "q")
    val ex = intercept[Exception](graft.operators.Dedup.canonicalByScore(
      docs, "doc_id", clusters, minScores, "q").collect())
    assert(ex.getMessage.contains("Long.MinValue"))
  }

  test("contaminationSpans: overlapping hits fuse into one maximal " +
      "span, separated hits stay separate, multi-item docs emit one " +
      "row per (doc, item, span), boundary spans are half-open") {
    import spark.implicits._
    // bench item 100: "q1 a b c d" -> shingles {q1 a b, a b c, b c d}
    // bench item 200: "z1 z2 z3"   -> one shingle {z1 z2 z3}
    val bench = Seq((100L, "q1 a b c d"), (200L, "z1 z2 z3"))
      .toDF("doc_id", "text")
    val train = Seq(
      // doc 1: quotes item 100 verbatim at tokens 2..6 (overlapping
      // shingle starts 2,3,4 fuse into ONE span [2,7)), then item 200
      // at the very END (boundary span [8,11))
      (1L, "x y q1 a b c d x z1 z2 z3"),
      // doc 2: two SEPARATED quotes of item 100's first shingle —
      // starts 0 and 5, gap > k, so two spans [0,3) and [5,8)
      (2L, "q1 a b s t q1 a b"),
      // doc 3: clean — no rows at all
      (3L, "nothing shared here at all")
    ).toDF("doc_id", "text")
    val out = graft.operators.Dedup.contaminationSpans(train, bench)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(out === Set(
      (1L, 100L, 2L, 7L, 3L),
      (1L, 200L, 8L, 11L, 1L),
      (2L, 100L, 0L, 3L, 1L),
      (2L, 100L, 5L, 8L, 1L)),
      s"got $out")
  }

  test("scrubContaminatedSpans: only covered tokens go, order survives, " +
      "fully-covered docs scrub to empty, clean docs pass through") {
    import spark.implicits._
    val bench = Seq((100L, "q1 a b c d"), (200L, "z1 z2 z3"))
      .toDF("doc_id", "text")
    val train = Seq(
      // spans [2,7) and [8,11) covered -> kept tokens x y (0,1) + x (7)
      (1L, "x y q1 a b c d x z1 z2 z3"),
      // fully covered: every token inside a matched shingle span
      (2L, "z1 z2 z3"),
      // clean: passes through reassembled
      (3L, "nothing shared here at all"),
      // overlapping matched shingles cover [0,4): kept = tail "s t"
      (4L, "q1 a b c s t")
    ).toDF("doc_id", "text")
    val out = graft.operators.Dedup.scrubContaminatedSpans(train, bench)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(1L) === (("x y x", 3L, 8L)))
    assert(out(2L) === (("", 0L, 3L)))
    assert(out(3L) === (("nothing shared here at all", 5L, 0L)))
    assert(out(4L) === (("s t", 2L, 4L)))
  }

  test("burnedBenchmarkItems: worst-case coverage per item, ties to " +
      "the lower train doc, clean items report zeros") {
    import spark.implicits._
    // item 100 has 3 shingles; doc 1 matches all 3 (coverage 1e6),
    // doc 2 matches 1. item 200 (1 shingle) matched by docs 1 and 2
    // equally (1 each) -> worst doc ties to the LOWER id 1. item 300
    // is clean.
    val bench = Seq((100L, "q1 a b c d"), (200L, "z1 z2 z3"),
      (300L, "u1 u2 u3")).toDF("doc_id", "text")
    val train = Seq(
      (1L, "q1 a b c d and z1 z2 z3"),
      (2L, "a b c plus z1 z2 z3")).toDF("doc_id", "text")
    val out = graft.operators.Dedup.burnedBenchmarkItems(train, bench)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) -1L else r.getLong(3), r.getLong(4)))).toMap
    assert(out(100L) === ((3L, 2L, 1L, 1000000L)),
      "doc 1 covers the whole item")
    assert(out(200L) === ((1L, 2L, 1L, 1000000L)),
      "equal matches tie to the lower doc id")
    assert(out(300L) === ((1L, 0L, -1L, 0L)), "clean items report zeros")
  }

  test("splitLeakageAudit: a near-dup pair split across the boundary " +
      "reads leaked, singletons never leak, and the leakage-safe " +
      "cluster split audits CLEAN on the same corpus") {
    import spark.implicits._
    // docs 1/2 near-duplicate (identical text), 3 unique
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"),
      (3L, "completely different content here now")).toDF("doc_id", "text")
    // an inherited BAD split: the dup pair straddles train/test
    val bad = Seq((1L, "train"), (2L, "test"), (3L, "train"))
      .toDF("doc_id", "split")
    val out = graft.operators.Dedup.splitLeakageAudit(docs, bad,
        numHashes = 8, rowsPerBand = 2, thresholdTenths = 1)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3), r.getLong(4),
          r.getBoolean(5))))
      .toMap
    assert(out(1L) === ((2L, 2L, "test|train", 0L, true)),
      "the straddling near-dup cluster is a leak")
    assert(out(3L) === ((1L, 1L, "train", 0L, false)),
      "singletons can never leak")
    // the prevention-measurement duality: leakageSafeSplit's own
    // assignment must audit clean on the same corpus
    val safe = graft.operators.Dedup.leakageSafeSplit(docs, "text",
        "doc_id", salt = "exp1", trainPct = 50, valPct = 25,
        numHashes = 8, rowsPerBand = 2, thresholdTenths = 1)
      .select(col("doc_id"), col("split"))
    val audit = graft.operators.Dedup.splitLeakageAudit(docs, safe,
        numHashes = 8, rowsPerBand = 2, thresholdTenths = 1)
      .filter(col("leaked")).count()
    assert(audit === 0L, "the cluster split can never leak by construction")
  }

  test("crossSourceOverlap: cross-source mirrors read off-diagonal, " +
      "within-source duplication reads the diagonal, clean pairs emit " +
      "no row, null sources label '<null>'") {
    import spark.implicits._
    val t1 = "alpha beta gamma delta epsilon zeta"
    val t2 = "hotel india juliet kilo lima mike"
    val docs = Seq(
      (1L, t1, Option("srcA")), (2L, t1, Option("srcB")),
      (6L, t1, Option.empty[String]), // unattributed member of cluster t1
      (3L, t2, Option("srcA")), (4L, t2, Option("srcA")),
      (5L, "completely different content here now", Option("srcB")))
      .toDF("doc_id", "text", "src")
    val out = graft.operators.Dedup.crossSourceOverlap(docs, "text",
        "doc_id", "src", numHashes = 8, rowsPerBand = 2,
        thresholdTenths = 1)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out(("srcA", "srcB")) === ((1L, 1L, 1L)),
      "cluster t1 holds one doc of each — the cross-source mirror row")
    assert(out(("srcA", "srcA")) === ((1L, 2L, 2L)),
      "the diagonal counts only multi-doc same-source clusters (t2), " +
        "never t1's single srcA member")
    assert(out(("<null>", "srcA")) === ((1L, 1L, 1L)) &&
      out(("<null>", "srcB")) === ((1L, 1L, 1L)),
      "an unattributed doc is still a doc — '<null>' is a source label")
    assert(!out.contains(("srcB", "srcB")),
      "no within-srcB duplication: absence IS the clean verdict")
    assert(!out.contains(("<null>", "<null>")))
  }

  test("effectiveTokens: duplicated tokens discount by cluster size " +
      "with the documented floor division, null-text docs hold a dedup " +
      "slot with zero tokens") {
    import spark.implicits._
    val t1 = "alpha beta gamma delta epsilon zeta" // 6 tokens
    val t2 = "hotel india juliet kilo lima mike"   // 6 tokens
    val docs = Seq(
      (1L, Option(t1), "srcA"), (2L, Option(t1), "srcA"), // dup pair
      (3L, Option("four plain tokens here"), "srcB"),
      (4L, Option.empty[String], "srcB"),                  // null text
      (5L, Option(t2), "srcC"), (6L, Option(t2), "srcC"),
      (7L, Option(t2), "srcC"))                            // triple
      .toDF("doc_id", "text", "src")
    val out = graft.operators.Dedup.effectiveTokens(docs, "text",
        "doc_id", "src", numHashes = 8, rowsPerBand = 2,
        thresholdTenths = 1)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3),
          if (r.isNullAt(4)) -1L else r.getLong(4)))).toMap
    assert(out("srcA") === ((2L, 12L, 6000000L, 500000L)),
      "a dup pair's 12 raw tokens are worth exactly 6 effective")
    assert(out("srcB") === ((2L, 4L, 4000000L, 1000000L)),
      "unique content keeps full weight; the null-text doc counts " +
        "with zero tokens")
    assert(out("srcC") === ((3L, 18L, 5999994L, 333333L)),
      "the 3-cluster inherits softDedupWeights' floor (333333 micros " +
        "per copy), replayed, never hidden")
  }

  test("splitLeakageAudit: a PARTIALLY-covered assignment never shrinks " +
      "the audit universe — unassigned members still count in n_docs, " +
      "surface as n_unassigned, and a straddle with an unlabeled third " +
      "member still reads leaked") {
    import spark.implicits._
    // docs 1/2/3 one near-dup cluster; docs 4/5 a second cluster; 6 unique
    val t1 = "alpha beta gamma delta epsilon zeta"
    val t2 = "hotel india juliet kilo lima mike"
    val docs = Seq((1L, t1), (2L, t1), (3L, t1), (4L, t2), (5L, t2),
      (6L, "completely different content here now")).toDF("doc_id", "text")
    // the inherited split map covers only docs 1, 2 and 6: cluster
    // {1,2,3} straddles with an UNLABELED third member (the inner-join
    // shape would report n_docs=2); cluster {4,5} is entirely
    // unlabeled (the inner-join shape would drop it from the audit)
    val partial = Seq((1L, "train"), (2L, "test"), (6L, "train"))
      .toDF("doc_id", "split")
    val out = graft.operators.Dedup.splitLeakageAudit(docs, partial,
        numHashes = 8, rowsPerBand = 2, thresholdTenths = 1)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3), r.getLong(4),
          r.getBoolean(5))))
      .toMap
    assert(out(1L) === ((3L, 2L, "test|train", 1L, true)),
      "the unlabeled third member counts and the straddle still reads")
    assert(out(4L) === ((2L, 0L, "", 2L, false)),
      "an entirely-unlabeled cluster stays visible with empty splits")
    assert(out(6L) === ((1L, 1L, "train", 0L, false)))
  }

  test("conversation-grain dedup chain: a re-crawled reply tree's " +
      "rendered conversations collapse onto the originals, distinct " +
      "conversations keep full weight") {
    import spark.implicits._
    // tree A (ids 0-4): root 0 -> 1 -> {3, 4}, 0 -> 2. Leaves 2, 3, 4.
    // Paths 3 and 4 share 3 of 4 turns but get DISJOINT text below, so
    // at threshold 0.8 they stay apart; tree B = re-crawl at +100.
    val words = Map(
      0L -> "alpha bravo charlie delta echo foxtrot golf hotel",
      1L -> "india juliet kilo lima mike november oscar papa",
      2L -> "quebec romeo sierra tango uniform victor whiskey xray",
      3L -> "yankee zulu apple banana cherry date elder fig",
      4L -> "grape honey iris jasmine kiwi lemon mango nectar")
    def tree(off: Long) = words.toSeq.map { case (id, txt) =>
      (id + off,
        if (id == 0L) None else Some((id - 1) / 2 + off),
        if (id == 0L) "system" else if (id % 2 == 1) "user" else "assistant",
        txt)
    }
    val msgs = (tree(0L) ++ tree(100L))
      .toDF("msg_id", "parent_id", "role", "text")
    val rendered = graft.operators.Behavior.renderChatTemplate(
      graft.operators.Behavior.dialogPaths(msgs, "msg_id", "parent_id",
        "role", "text", maxDepth = 8),
      "path_id", "turn", "msg_id", "role", "text")
    val out = Dedup.softDedupWeights(rendered, "rendered", "path_id",
        numHashes = 8, rowsPerBand = 2, thresholdTenths = 8)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out.keySet === Set(2L, 3L, 4L, 102L, 103L, 104L),
      "one row per conversation, both crawls")
    Seq(2L, 3L, 4L).foreach { leaf =>
      assert(out(leaf) === ((leaf, 2L, 500000L)),
        s"leaf $leaf collapses with its re-crawl twin only")
      assert(out(leaf + 100L) === ((leaf, 2L, 500000L)),
        s"re-crawled leaf ${leaf + 100L} clusters under original $leaf")
    }
  }
}
