package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Packing

class PackingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private def docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
  private val budget = 512

  test("every document lands in exactly one pack; packs are dense per shard") {
    val out = Packing.packSequences(docs, budget, shards = 4, salt = "pk").cache()
    assert(out.count() === docs.count())
    assert(out.select("doc_id").distinct().count() === docs.count())
    // packs within a shard are 0..max with no gaps
    val gaps = out.groupBy("shard")
      .agg(max("pack").as("mx"), countDistinct("pack").as("n"))
      .filter(col("n") =!= col("mx") + 1)
    assert(gaps.isEmpty, "pack ids must be dense per shard")
    out.unpersist()
  }

  test("pack totals respect the bounded-overflow contract") {
    val out = Packing.packSequences(docs, budget, shards = 4, salt = "pk")
    val maxTok = out.agg(max("n_tokens")).head.getInt(0)
    val totals = out.groupBy("shard", "pack")
      .agg(sum("n_tokens").as("total"), max("pack").as("p"))
    val lastPack = out.groupBy("shard").agg(max("pack").as("last"))
    val joined = totals.join(lastPack, Seq("shard")).collect()
    joined.foreach { r =>
      val total = r.getAs[Long]("total")
      assert(total < budget + maxTok,
        s"pack exceeded budget+maxdoc: $r (maxTok $maxTok)")
      if (r.getAs[Int]("p") != r.getAs[Int]("last"))
        assert(total > budget - maxTok,
          s"non-final pack underfilled beyond one straddle: $r (maxTok $maxTok)")
    }
  }

  test("a document longer than the budget keeps pack ids dense") {
    import spark.implicits._
    // one 1100-token doc in a 512 budget consumes >2 spans: without the
    // dense renumbering the next doc would land in span 2 and pack 1
    // would never exist
    val fixture = Seq(
      (1L, (1 to 1100).map(i => s"t$i").mkString(" ")),
      (2L, (1 to 100).map(i => s"u$i").mkString(" ")),
      (3L, (1 to 600).map(i => s"v$i").mkString(" "))
    ).toDF("doc_id", "text")
    val out = Packing.packSequences(fixture, budget, shards = 1, salt = "pk")
    val packs = out.select("pack").collect().map(_.getInt(0)).sorted.toSeq
    assert(packs.distinct === (0 to packs.max).toSeq, s"gapless packs: $packs")
    assert(out.groupBy("pack").count().count() === packs.distinct.size)
  }

  test("packing is deterministic and independent of physical layout") {
    val a = Packing.packSequences(docs, budget, 4, "pk")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val b = Packing.packSequences(docs.repartition(17), budget, 4, "pk")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(a === b)
  }

  test("inputs are validated") {
    assert(intercept[IllegalArgumentException](
      Packing.packSequences(docs, 0, 4, "pk")).getMessage.contains("budget"))
    assert(intercept[IllegalArgumentException](
      Packing.packSequences(docs, 512, 0, "pk")).getMessage.contains("shard"))
  }

  test("packed SFT with loss-mask spans: spans tile each pack gaplessly " +
      "in order, masks cover exactly the response tokens, empty sides " +
      "omit their span, zero-token examples still count") {
    import spark.implicits._
    import org.apache.spark.sql.Row
    val pairs = Seq(
      (1L, "user: hi there", "hello there my friend"),
      (2L, "", "short answer"),             // first-turn: masked span only
      (3L, "user: a b c", ""),              // empty response: unmasked only
      (4L, "user: q w e r t y", "a1 a2 a3 a4"),
      (5L, "", "")                          // zero tokens: a doc, no spans
    ).toDF("doc_id", "context", "response")
    val nc = Map(1L -> 3L, 2L -> 0L, 3L -> 4L, 4L -> 7L, 5L -> 0L)
    val nr = Map(1L -> 4L, 2L -> 2L, 3L -> 0L, 4L -> 4L, 5L -> 0L)
    val rows = Packing.packSftWithMasks(pairs, budget = 8, shards = 2,
      salt = "sft").collect()
    assert(rows.map(_.getAs[Long]("n_docs")).sum === 5L,
      "every example (even the zero-token one) lands in exactly one pack")
    assert(rows.map(_.getAs[Long]("n_tokens")).sum ===
      (nc.values.sum + nr.values.sum))
    assert(rows.map(_.getAs[Long]("n_masked")).sum === nr.values.sum,
      "the masked total is exactly the response tokens")
    rows.foreach { r =>
      val segs = r.getAs[scala.collection.Seq[Row]]("segments")
      // spans tile [0, n_tokens) gaplessly in sorted order
      var pos = 0L
      segs.foreach { s =>
        assert(s.getAs[Long]("tok_start") === pos,
          "each span starts where the previous ended")
        assert(s.getAs[Long]("tok_end") > s.getAs[Long]("tok_start"),
          "zero-length spans are omitted")
        pos = s.getAs[Long]("tok_end")
      }
      assert(pos === r.getAs[Long]("n_tokens"), "spans cover the pack")
      // per example: span lengths are the side's token counts, the
      // unmasked context span precedes the masked response span
      segs.groupBy(_.getAs[Long]("doc_id")).foreach { case (id, ss) =>
        val (m, u) = ss.partition(_.getAs[Boolean]("mask"))
        assert(u.map(s => s.getAs[Long]("tok_end") -
          s.getAs[Long]("tok_start")).sum === nc(id))
        assert(m.map(s => s.getAs[Long]("tok_end") -
          s.getAs[Long]("tok_start")).sum === nr(id))
        for (us <- u; ms <- m)
          assert(us.getAs[Long]("tok_end") === ms.getAs[Long]("tok_start"),
            "context and response spans are contiguous, context first")
      }
    }
  }

  test("pack fill: hand fill ppm, overflow = the truncation-loss " +
      "estimate, the bounded-overflow contract holds pack-by-pack") {
    import spark.implicits._
    // one shard so the layout is a single deterministic chain
    val docs = (1L to 30L).map(i => (i, 40L + (i % 7) * 30L))
      .toDF("doc_id", "n_tokens")
    val packed = graft.operators.Packing.packByCount(
      docs, budget = 256, shards = 1, salt = "pf")
    val fill = graft.operators.Packing.packFill(packed, 256).collect()
    val maxDoc = 220L
    val maxPack = fill.map(r => r.getAs[Int]("pack")).max
    fill.foreach { r =>
      val t = r.getAs[Long]("n_tokens")
      val ppm = r.getAs[Long]("fill_ppm")
      val ov = r.getAs[Long]("overflow_tokens")
      assert(ppm === (2 * t * 1000000L + 256) / 512, "hand half-up ppm")
      assert(ov === math.max(0L, t - 256), "overflow is tokens past budget")
      if (r.getAs[Int]("pack") < maxPack)
        assert(t > 256 - maxDoc && t < 256 + maxDoc,
          "non-tail packs land within one max-doc of the budget (a " +
            "straddling doc's tail deflates the NEXT pack — the " +
            "documented bounded-overflow contract, both sides)")
    }
    // totals reconcile: nothing lost between assignment and audit
    assert(fill.map(_.getAs[Long]("n_tokens")).sum ===
      docs.collect().map(_.getLong(1)).sum)
  }

  test("length-bucket batches: power-of-2 buckets, hand padding ppm, " +
      "the <50% padding bound holds across a length spread, fixed batch " +
      "size with one short tail per (shard, bucket)") {
    import spark.implicits._
    def run(lens: Seq[Long], batchSize: Int) =
      graft.operators.Packing.lengthBucketBatches(
        lens.zipWithIndex.map { case (n, i) => (i.toLong, n) }
          .toDF("doc_id", "n_tokens"),
        batchSize, shards = 1, salt = "lb")
    // bucket = binary digit count: 1 -> 1, 2..3 -> 2, 4..7 -> 3, 8 -> 4,
    // and the zero-token edge shares bucket 1
    val b = run(Seq(0L, 1L, 2L, 3L, 4L, 7L, 8L), 10)
      .collect().map(r => r.getAs[Long]("n_tokens") ->
        r.getAs[Long]("bucket")).toMap
    assert(b === Map(0L -> 1L, 1L -> 1L, 2L -> 2L, 3L -> 2L, 4L -> 3L,
      7L -> 3L, 8L -> 4L))
    // hand padding: [5, 7] alone in bucket 3, one batch of 2 -> the
    // 5-token doc pads 2 of 14 slots = 142857 ppm half-up
    val pad = run(Seq(5L, 7L), 2).collect()
    assert(pad.forall(r => r.getAs[Long]("batch_max") === 7L &&
      r.getAs[Long]("batch_docs") === 2L &&
      r.getAs[Long]("padding_ppm") === 142857L))
    // the structural bound: any mix of NON-EMPTY lengths pads < 50%
    val spread = run((1L to 100L) ++ Seq(1000L, 1023L, 512L), 4)
      .collect()
    assert(spread.forall(_.getAs[Long]("padding_ppm") < 500000L),
      "power-of-2 bucketing bounds padding below half by construction")
    // batches fill to batchSize except one tail per (shard, bucket)
    spread.groupBy(r => (r.getAs[Long]("shard"), r.getAs[Long]("bucket")))
      .foreach { case ((_, bk), rows) =>
        val sizes = rows.groupBy(_.getAs[Long]("batch"))
          .map { case (k, v) => k -> v.length }
        val maxBatch = sizes.keys.max
        sizes.foreach { case (k, n) =>
          if (k < maxBatch) assert(n === 4, s"bucket $bk batch $k full")
          else assert(n >= 1 && n <= 4)
        }
      }
    // an all-empty batch pads nothing (max 0 defines padding 0)
    assert(run(Seq(0L, 0L, 0L), 3).collect()
      .forall(_.getAs[Long]("padding_ppm") === 0L))
  }
}
