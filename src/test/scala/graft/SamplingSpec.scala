package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Sampling

class SamplingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private def docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  test("mixture sampling takes exactly the quota per listed domain") {
    val out = Sampling.mixtureSample(docs, "source", "doc_id", "mix",
      Map("src0" -> 10, "src1" -> 5, "src2" -> 15))
    val counts = out.groupBy("source").count()
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(counts === Map("src0" -> 10L, "src1" -> 5L, "src2" -> 15L))
    // rn is a dense within-domain rank starting at 1
    val rns = out.filter(col("source") === "src0")
      .select("rn").collect().map(_.getInt(0)).sorted.toSeq
    assert(rns === (1 to 10))
  }

  test("mixture sampling is deterministic and partitioning-independent") {
    val quotas = Map("src3" -> 7, "src4" -> 3)
    val a = Sampling.mixtureSample(docs, "source", "doc_id", "mix", quotas)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
    val b = Sampling.mixtureSample(docs.repartition(13), "source", "doc_id",
        "mix", quotas)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
    assert(a === b, "sample must not depend on physical layout")
  }

  test("a domain smaller than its quota contributes all of itself") {
    // src5 has 25 docs at sf0.001; quota 100 takes the whole domain
    val out = Sampling.mixtureSample(docs, "source", "doc_id", "mix",
      Map("src5" -> 100))
    assert(out.count() === 25)
    assert(out.agg(max("rn")).head.getInt(0) === 25)
  }

  test("raising a quota only appends: the smaller sample is a prefix") {
    def ids(q: Int) = Sampling.mixtureSample(docs, "source", "doc_id", "mix",
        Map("src6" -> q))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val small = ids(5)
    val big = ids(12)
    assert(small.subsetOf(big),
      "the md5 rank order is fixed — a bigger quota must extend, not reshuffle")
  }

  test("weights derive quotas as floor(weight * total), minimum 1") {
    val out = Sampling.mixtureByWeights(docs, "source", "doc_id", "mix",
      Map("src7" -> 0.5, "src8" -> 0.01), total = 20)
    val counts = out.groupBy("source").count()
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(counts === Map("src7" -> 10L, "src8" -> 1L))
  }

  test("temperature resampling flattens toward uniform; alpha=1 is proportional") {
    import spark.implicits._
    // a:16, b:4, c:1 rows. alpha=0.5 → weights sqrt = 4:2:1 (S=7);
    // total=7 → quotas a=4, b=2, c=1. Proportional (alpha=1) at
    // total=21 → a=16, b=4, c=1 — the natural distribution.
    val skewed = ((1L to 16L).map(i => (i, "a")) ++
      (17L to 20L).map(i => (i, "b")) :+ ((21L, "c")))
      .toDF("doc_id", "source")
    def domCounts(out: org.apache.spark.sql.DataFrame): Map[String, Long] =
      out.groupBy("source").count()
        .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val flat = Sampling.temperatureSample(skewed, "source", "doc_id", "t",
      total = 7, alpha = 0.5)
    assert(domCounts(flat) === Map("a" -> 4L, "b" -> 2L, "c" -> 1L),
      "sqrt-flattened quotas must up-weight the small domains")
    val prop = Sampling.temperatureSample(skewed, "source", "doc_id", "t",
      total = 21, alpha = 1.0)
    assert(domCounts(prop) === Map("a" -> 16L, "b" -> 4L, "c" -> 1L),
      "alpha=1 must reproduce the natural distribution")
    // every listed domain keeps >= 1 row even when its quota floors to 0
    val tiny = Sampling.temperatureSample(skewed, "source", "doc_id", "t",
      total = 2, alpha = 0.5)
    assert(domCounts(tiny).keySet === Set("a", "b", "c"))
    // guards: alpha range and the high-cardinality fail-fast name the knob
    assert(intercept[IllegalArgumentException](
      Sampling.temperatureSample(skewed, "source", "doc_id", "t", 7, 1.5))
      .getMessage.contains("alpha"))
    assert(intercept[IllegalArgumentException](
      Sampling.temperatureSample(skewed, "source", "doc_id", "t", 7, 0.5,
        maxDomains = 2)).getMessage.contains("maxDomains"))
  }

  test("weighted sampling: proportional inclusion, determinism, exclusions") {
    import spark.implicits._
    // heavy rows (w=50) vs light rows (w=1): over a 200-row population
    // the k=40 sample must be dominated by heavy rows, but E-S keeps
    // light rows possible — assert dominance, not exclusion
    val pop = ((1L to 100L).map(i => (i, 50L)) ++
      (101L to 200L).map(i => (i, 1L))).toDF("doc_id", "w")
    val got = Sampling.weightedSample(pop, "doc_id", "w", "t", k = 40)
    val picked = got.collect().map(_.getLong(0))
    assert(picked.length === 40)
    assert(picked.distinct.length === 40, "without replacement")
    val heavy = picked.count(_ <= 100L)
    assert(heavy >= 30, s"w=50 rows must dominate the sample, got $heavy/40")
    // deterministic and layout-independent
    val again = Sampling.weightedSample(pop.repartition(17), "doc_id", "w", "t", 40)
      .collect().map(_.getLong(0))
    assert(again.toSeq === picked.toSeq)
    // null/NaN/non-positive weights and null ids are excluded, not errors
    val dirty = Seq(
      (Some(1L), Some(5.0)), (Some(2L), Some(0.0)),
      (Some(3L), None: Option[Double]), (Some(4L), Some(Double.NaN)),
      (None: Option[Long], Some(9.0)))
      .toDF("doc_id", "w")
    assert(Sampling.weightedSample(dirty, "doc_id", "w", "t", 10)
      .collect().map(_.getLong(0)).toSeq === Seq(1L))
    assert(intercept[IllegalArgumentException](
      Sampling.weightedSample(pop, "doc_id", "w", "t", 0))
      .getMessage.contains("k"))
  }

  test("class balancing levels every class to the smallest one") {
    val out = Sampling.balanceClasses(docs, "lang", "doc_id", "bal")
    val counts = out.groupBy("lang").count()
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val minClass = docs.groupBy("lang").count()
      .agg(min("count")).head.getLong(0)
    assert(counts.values.toSet === Set(minClass),
      s"every class must contribute exactly $minClass rows: $counts")
    assert(counts.keySet === docs.select("lang").distinct()
      .collect().map(_.getString(0)).toSet)
    assert(intercept[IllegalArgumentException](
      Sampling.balanceClasses(docs, "doc_id", "doc_id", "bal"))
      .getMessage.contains("string"))
    // exact balance buffers min-class-sized ranks — past the cap the
    // operator must point at the map-only alternative, not OOM
    assert(intercept[IllegalArgumentException](
      Sampling.balanceClasses(docs, "lang", "doc_id", "bal", maxMinClass = 2))
      .getMessage.contains("downsample"))
  }

  test("non-integral id columns fail fast instead of corrupting silently") {
    val stringIds = docs.withColumn("doc_id", col("doc_id").cast("string"))
    assert(intercept[IllegalArgumentException](
      Sampling.mixtureSample(stringIds, "source", "doc_id", "mix",
        Map("src0" -> 5))).getMessage.contains("integral"))
  }

  test("mixture sampling validates its inputs") {
    assert(intercept[IllegalArgumentException](
      Sampling.mixtureSample(docs, "source", "doc_id", "mix", Map.empty))
      .getMessage.contains("domain"))
    assert(intercept[IllegalArgumentException](
      Sampling.mixtureSample(docs, "source", "doc_id", "mix", Map("src0" -> 0)))
      .getMessage.contains("positive"))
  }

  test("mixture reweighting: upweights the lossy domain; a loss signal " +
      "so negative every multiplier rounds to 0 fails fast, not null") {
    import spark.implicits._
    val loss = Seq(("hard", 2.0), ("easy", 0.1)).toDF("domain", "loss")
    val w = Sampling.mixtureReweight(loss, rounds = 3)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(w("hard") > w("easy"), s"lossier domain must upweight: $w")
    assert(math.abs(w.values.sum - 1000000L) <= w.size,
      s"micros must renormalize to ~1e6: $w")
    // eta·loss·(1−w) ≈ 0.5 · −60 · 0.5 = −15 < −14.5 for every domain:
    // both exp multipliers round to 0 at 6 dp — the round total would
    // be 0 and the old code emitted silent null weights
    val degenerate = Seq(("a", -60.0), ("b", -60.0)).toDF("domain", "loss")
    assert(intercept[IllegalArgumentException](
      Sampling.mixtureReweight(degenerate, rounds = 1))
      .getMessage.contains("collapsed"))
  }

  test("doremi mixture: optimized weights drive exact quotas end to end") {
    import spark.implicits._
    // 'hard' upweights past 'easy', so its quota must be strictly larger
    // even though both get the same total budget share to start
    val loss = Seq(("src0", 1.5), ("src1", 0.0)).toDF("domain", "loss")
    val out = Sampling.doremiMixture(docs, "source", "doc_id", loss,
      rounds = 3, salt = "dm", total = 40)
    val counts = out.groupBy("source").count()
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(counts.keySet === Set("src0", "src1"),
      "domains outside the loss relation contribute nothing")
    assert(counts("src0") > counts("src1"),
      s"the lossier domain must win quota: $counts")
    // determinism across physical layout (the mixtureSample contract)
    val again = Sampling.doremiMixture(docs.repartition(7), "source",
        "doc_id", loss, rounds = 3, salt = "dm", total = 40)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
    assert(again === out.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet)
  }

  test("curriculum ordering: gapless easy->hard schedule, salted in-tier shuffle") {
    import spark.implicits._
    val df = (1L to 80L).map(i => (i, (i * 7 % 100).toInt))
      .toDF("doc_id", "difficulty")
      .union(Seq((999L, null.asInstanceOf[Integer])).map {
        case (i, v) => (i, Option(v).map(_.toInt))
      }.toDF("doc_id", "difficulty"))
    val out = Sampling.curriculumOrder(df, "difficulty", "doc_id",
        nTiers = 4, salt = "ep0")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    // null-difficulty row excluded; the rest scheduled
    assert(out.length === 80 && !out.exists(_._1 == 999L))
    // curriculum_idx is a gapless 0-based permutation
    assert(out.map(_._3).sorted.toSeq === (0L until 80L))
    // tiers are non-decreasing along the schedule (easy -> hard)
    val byIdx = out.sortBy(_._3).map(_._2)
    assert(byIdx.zip(byIdx.tail).forall { case (a, b) => a <= b })
    // a new salt reshuffles WITHIN tiers but never moves a row across
    val ep1 = Sampling.curriculumOrder(df, "difficulty", "doc_id",
        nTiers = 4, salt = "ep1")
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2)))).toMap
    val ep0 = out.map(t => t._1 -> ((t._2, t._3))).toMap
    assert(ep0.keySet === ep1.keySet)
    assert(ep0.forall { case (id, (tier, _)) => ep1(id)._1 === tier })
    assert(ep0.exists { case (id, (_, idx)) => ep1(id)._2 != idx },
      "a fresh salt must actually reshuffle")
  }

  test("per-key cap: over-cap keys keep exactly k lowest-md5 rows, " +
      "under-cap keys keep everything, null keys group, salts redraw") {
    import spark.implicits._
    val df = ((1L to 20L).map(i => (i, Option("big.com"))) ++
      (21L to 23L).map(i => (i, Option("small.org"))) ++
      (24L to 30L).map(i => (i, Option.empty[String])))
      .toDF("doc_id", "host")
    val out = Sampling.capPerKey(df, "host", "doc_id", "s1", k = 5)
      .collect().map(r => (Option(r.getString(1)), r.getLong(0))).toSeq
    val byKey = out.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(byKey(Some("big.com")).size === 5, "over-cap keys clip to k")
    assert(byKey(Some("small.org")) === Set(21L, 22L, 23L),
      "under-cap keys keep everything")
    assert(byKey(None).size === 5, "null keys are a capped group too")
    // the kept set is exactly the k lowest md5('s1|'||id) per key
    val expect = (1L to 20L).sortBy(i =>
      org.apache.commons.codec.digest.DigestUtils.md5Hex(s"s1|$i"))
      .take(5).toSet
    assert(byKey(Some("big.com")) === expect)
    // a fresh salt actually redraws
    val out2 = Sampling.capPerKey(df, "host", "doc_id", "s2", k = 5)
      .collect().filter(r => r.getString(1) == "big.com")
      .map(_.getLong(0)).toSet
    assert(out2 !== expect, "a fresh salt must redraw the capped set")
  }

  test("epoch plan: quota arithmetic survives a multi-quintillion-token " +
      "budget (the w_m * total product overflows Long; DECIMAL doesn't)") {
    import spark.implicits._
    val df = Seq(("web", 4000000000000000000L), ("code", 100L))
      .toDF("source", "n_tokens")
    val out = Sampling.epochPlan(df, "source", "n_tokens",
        weightsMicros = Map("web" -> 900000L, "code" -> 100000L),
        totalTokens = 5000000000000000000L, maxEpochs = 4)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(5)))).toMap
    // web: quota = 0.9 * 5e18 = 4.5e18 (the raw product 4.5e24 wraps a
    // Long); avail 4e18 -> 2 epochs cover it, unmet 0
    assert(out("web") === ((4000000000000000000L, 4500000000000000000L,
      2L, 0L)))
    // code: quota 5e17 over 100 available tokens; 4-epoch cap leaves
    // nearly the whole quota unmet
    assert(out("code") === ((100L, 500000000000000000L, 4L,
      500000000000000000L - 400L)))
    // weights beyond 1e12 micros are refused (DECIMAL(38,0) headroom)
    intercept[IllegalArgumentException](
      Sampling.epochPlan(df, "source", "n_tokens",
        Map("web" -> 2000000000000L), 100L, 1))
  }
}
