package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Behavior
import graft.streaming.EventStreams

/** Property-based incremental==batch parity for the streaming
  * finalized-prefix operators: RANDOM event sets, RANDOM arrival order,
  * random micro-batch splits — the deterministic unit fixtures pin the
  * boundary rules, these pin that no arrival permutation can break the
  * fold. The watermark allowance spans the whole generated time range,
  * so no generated event is ever late-dropped and the batch operator is
  * the exact expected output (mid-stream finalization under a tight
  * allowance is covered by the deterministic EventStreamsSpec tests). */
class StreamingPropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def forAll[T](g: Gen[T], n: Int)(body: (T, Int) => Unit): Unit =
    (0 until n).foreach { i =>
      g.apply(Gen.Parameters.default, Seed(i.toLong)).foreach(t => body(t, i))
    }

  private val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime

  /** (user, event_id, type, ts) sets: 3 users, 8–16 events, ts within
    * one day at second granularity (ties likely), types incl. noise. */
  private val eventsGen: Gen[List[(Long, Long, String, java.sql.Timestamp)]] =
    for {
      n <- Gen.chooseNum(8, 16)
      rows <- Gen.listOfN(n, for {
        u <- Gen.chooseNum(1L, 3L)
        s <- Gen.chooseNum(0L, 6L * 3600L)
        t <- Gen.oneOf("view", "cart", "buy", "noise")
      } yield (u, s, t))
    } yield rows.zipWithIndex.map { case ((u, s, t), i) =>
      (u, i.toLong, t, new java.sql.Timestamp(base + s * 1000L))
    }

  /** Split a shuffled copy into 1–3 arrival batches + two far-future
    * sentinels (advance the watermark, fire the last timeouts). */
  private def arrivalBatches(rows: List[(Long, Long, String, java.sql.Timestamp)],
      seed: Int): Seq[Seq[(Long, Long, String, java.sql.Timestamp)]] = {
    val shuffled = new scala.util.Random(seed).shuffle(rows)
    val cut = 1 + seed % 3
    val per = math.max(1, shuffled.length / cut)
    shuffled.grouped(per).toSeq ++ Seq(
      Seq((99L, 9001L, "view", java.sql.Timestamp.valueOf("2030-01-01 00:00:00"))),
      Seq((99L, 9002L, "view", java.sql.Timestamp.valueOf("2030-01-02 00:00:00"))))
  }

  test("property: streaming sessionize == batch for random events and arrival orders") {
    forAll(eventsGen, 5) { (rows, i) =>
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[(Long, Long, String, java.sql.Timestamp)]
      val events = input.toDF().toDF("user_id", "event_id", "event_type", "ts")
      val q = EventStreams.sessionTags(spark, events,
          gapSeconds = 1800L, watermark = "7 days")
        .writeStream.outputMode("append").format("memory")
        .queryName(s"prop_sess_$i").start()
      try {
        arrivalBatches(rows, i).foreach { b =>
          input.addData(b); q.processAllAvailable()
        }
        val streamed = spark.table(s"prop_sess_$i")
          .filter(col("user_id") =!= 99L)
          .select(col("event_id"), col("session_id"))
        val batch = Behavior.sessionize(
            rows.toDF("user_id", "event_id", "event_type", "ts"),
            gapSeconds = 1800L, idCol = "event_id")
          .select(col("event_id"), col("session_id"))
        assert(streamed.count() === rows.length.toLong,
          s"seed $i: every event tagged exactly once")
        assert(streamed.exceptAll(batch).count() === 0 &&
          batch.exceptAll(streamed).count() === 0,
          s"seed $i: session ids diverged from the batch operator")
      } finally q.stop()
    }
  }

  /** Retention needs MULTI-WEEK spread: same shape as [[eventsGen]] but
    * timestamps range over ~5 weeks at hour granularity. */
  private val weeksGen: Gen[List[(Long, Long, String, java.sql.Timestamp)]] =
    for {
      n <- Gen.chooseNum(8, 16)
      rows <- Gen.listOfN(n, for {
        u <- Gen.chooseNum(1L, 3L)
        h <- Gen.chooseNum(0L, 35L * 24L)
      } yield (u, h))
    } yield rows.zipWithIndex.map { case ((u, h), i) =>
      (u, i.toLong, "view", new java.sql.Timestamp(base + h * 3600000L))
    }

  test("property: streaming retention == batch for random events and arrival orders") {
    forAll(weeksGen, 5) { (rows, i) =>
      implicit val sqlCtx = spark.sqlContext
      val input = MemoryStream[(Long, Long, String, java.sql.Timestamp)]
      val events = input.toDF().toDF("user_id", "event_id", "event_type", "ts")
      val q = EventStreams.retentionCells(spark, events, watermark = "90 days")
        .writeStream.outputMode("append").format("memory")
        .queryName(s"prop_ret_$i").start()
      try {
        arrivalBatches(rows, i).foreach { b =>
          input.addData(b); q.processAllAvailable()
        }
        val streamed = spark.table(s"prop_ret_$i")
          .filter(col("user_id") =!= 99L)
          .groupBy(col("cohort_week"), col("week_offset"))
          .agg(count(lit(1)).as("users"))
        val batch = Behavior.retention(
            rows.toDF("user_id", "event_id", "event_type", "ts"))
          .select(col("cohort_week"), col("week_offset"), col("users"))
        assert(streamed.exceptAll(batch).count() === 0 &&
          batch.exceptAll(streamed).count() === 0,
          s"seed $i: retention cohorts diverged from the batch operator")
      } finally q.stop()
    }
  }

  test("property: streaming funnel == batch for random events and arrival orders") {
    val steps = Seq("view", "cart", "buy")
    forAll(eventsGen, 5) { (rows, i) =>
      implicit val sqlCtx = spark.sqlContext
      val within = if (i % 2 == 0) None else Some(3600L)
      val input = MemoryStream[(Long, Long, String, java.sql.Timestamp)]
      val events = input.toDF().toDF("user_id", "event_id", "event_type", "ts")
      val q = EventStreams.funnelReach(spark, events, steps,
          withinSeconds = within, watermark = "7 days")
        .writeStream.outputMode("append").format("memory")
        .queryName(s"prop_funnel_$i").start()
      try {
        arrivalBatches(rows, i).foreach { b =>
          input.addData(b); q.processAllAvailable()
        }
        val streamed = spark.table(s"prop_funnel_$i")
          .filter(col("user_id") =!= 99L)
          .groupBy(col("step"), col("event_type"))
          .agg(count(lit(1)).as("users"))
        val batch = Behavior.funnel(
            rows.toDF("user_id", "event_id", "event_type", "ts"),
            steps, withinSeconds = within)
          .filter(col("users") > 0)
          .select(col("step"), col("event_type"), col("users"))
        assert(streamed.exceptAll(batch).count() === 0 &&
          batch.exceptAll(streamed).count() === 0,
          s"seed $i (within=$within): funnel counts diverged from batch")
      } finally q.stop()
    }
  }
}
