package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.EventStreams

/** Streaming semantics: each streaming aggregation must agree with its
  * batch equivalent when driven over the same (static) events parquet. */
class EventStreamsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"
  // the file-stream source requires a directory — stage the single parquet
  private lazy val path = {
    val d = java.nio.file.Files.createTempDirectory("graft-events")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      d.resolve("events.parquet"))
    d.toString
  }

  test("readEvents starts on an empty directory — files may land after the query") {
    val empty = java.nio.file.Files.createTempDirectory("graft-empty-events")
    val stream = EventStreams.readEvents(spark, empty.toString)
    assert(stream.isStreaming)
    // the footer probe found nothing: the LongType default applied, and
    // normalizeTs still surfaces a session-zone timestamp
    assert(stream.schema("ts").dataType ===
      org.apache.spark.sql.types.TimestampType)
    // the stream is actually runnable from the empty state: one
    // AvailableNow pass completes with zero rows instead of throwing
    val q = EventStreams.runToMemory(
      EventStreams.tumblingCounts(stream), "empty_start_out", "complete")
    try assert(spark.table("empty_start_out").count() === 0)
    finally q.stop()
  }

  test("streaming tumbling counts == batch tumbling counts") {
    val q = EventStreams.runToMemory(
      EventStreams.tumblingCounts(EventStreams.readEvents(spark, path)),
      "tumbling_out", "complete")
    try {
      val streamed = spark.table("tumbling_out")
      val batch = SparkEntry.queries("q_e1_tumbling_window")(spark, dir)
      assert(streamed.count() === batch.count())
      assert(streamed.exceptAll(batch).count() === 0)
      assert(batch.exceptAll(streamed).count() === 0)
    } finally q.stop()
  }

  test("streaming sliding counts == batch sliding counts") {
    val q = EventStreams.runToMemory(
      EventStreams.slidingCounts(EventStreams.readEvents(spark, path)),
      "sliding_out", "complete")
    try {
      val streamed = spark.table("sliding_out")
      val batch = SparkEntry.queries("q_e2_sliding_window")(spark, dir)
      assert(streamed.exceptAll(batch).count() === 0)
      assert(batch.exceptAll(streamed).count() === 0)
    } finally q.stop()
  }

  test("streaming session windows == batch session windows") {
    val q = EventStreams.runToMemory(
      EventStreams.sessionCounts(EventStreams.readEvents(spark, path)),
      "session_out", "complete")
    try {
      val streamed = spark.table("session_out")
      val batch = SparkEntry.queries("q_e3_session_windows")(spark, dir)
      assert(streamed.exceptAll(batch).count() === 0)
      assert(batch.exceptAll(streamed).count() === 0)
    } finally q.stop()
  }

  test("session windows merge INCREMENTALLY across micro-batches == batch") {
    // a session extended by a later micro-batch must merge in the state
    // store — the incremental path a single-batch file read never hits
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val rows = Seq(
      // batch 1: user 1 opens a session; user 2 opens one
      Seq((1L, ts("2024-01-01 10:00:00")), (2L, ts("2024-01-01 10:05:00"))),
      // batch 2: user 1 EXTENDS the open session (gap < 30 min)
      Seq((1L, ts("2024-01-01 10:20:00")), (1L, ts("2024-01-01 10:40:00"))),
      // batch 3: user 1 starts a NEW session (gap > 30 min)
      Seq((1L, ts("2024-01-01 12:00:00"))))
    val input = MemoryStream[(Long, java.sql.Timestamp)]
    val events = input.toDF().toDF("user_id", "ts")
    val q = EventStreams.sessionCounts(events)
      .writeStream.outputMode("complete").format("memory")
      .queryName("session_incr").start()
    try {
      rows.foreach { batch => input.addData(batch); q.processAllAvailable() }
      val streamed = spark.table("session_incr")
      val batchAll = EventStreams.sessionCounts(
        rows.flatten.toDF("user_id", "ts"))
      assert(streamed.exceptAll(batchAll).count() === 0 &&
        batchAll.exceptAll(streamed).count() === 0,
        "incrementally merged sessions must equal the batch rebuild")
      // and the merge really happened: user 1's first session spans all
      // three batch-1/2 events as ONE row of 3 events
      val u1 = streamed.filter(col("user_id") === 1 &&
        col("session_start") === ts("2024-01-01 10:00:00")).collect()
      assert(u1.length === 1 && u1.head.getAs[Long]("n_events") === 3)
    } finally q.stop()
  }

  test("streaming sessionize tags events INCREMENTALLY == batch gaps-and-islands") {
    // the q_e7 discipline applied to Behavior.sessionize: the streaming
    // operator (buffer-within-watermark + finalized-prefix emission) must
    // reproduce the batch operator's session ids exactly, including an
    // out-of-order arrival that lands INSIDE an already-open session
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val real = Seq(
      (1L, 1L, ts("2024-01-01 10:00:00")), (1L, 2L, ts("2024-01-01 10:20:00")),
      (2L, 3L, ts("2024-01-01 10:05:00")),
      // batch 2: e4 arrives LATE but inside the 10-min allowance — it
      // must slot between e1 and e2 in session 1#1
      (1L, 4L, ts("2024-01-01 10:11:00")), (1L, 5L, ts("2024-01-01 12:00:00")),
      (2L, 6L, ts("2024-01-01 10:50:00")))
    val batches = Seq(real.take(3), real.drop(3),
      // sentinels: two far-future batches advance the watermark past
      // every real event AND deliver a data batch at the advanced
      // watermark so the last event-time timeouts fire deterministically
      // (processAllAvailable does not wait for no-data micro-batches);
      // the sentinel user is excluded from the compare
      Seq((99L, 999L, ts("2030-01-01 00:00:00"))),
      Seq((99L, 998L, ts("2030-01-02 00:00:00"))))
    val input = MemoryStream[(Long, Long, java.sql.Timestamp)]
    val events = input.toDF().toDF("user_id", "event_id", "ts")
    val q = EventStreams.sessionTags(spark, events)
      .writeStream.outputMode("append").format("memory")
      .queryName("session_tags_incr").start()
    try {
      batches.foreach { b => input.addData(b); q.processAllAvailable() }
      val streamed = spark.table("session_tags_incr")
        .filter(col("user_id") =!= 99L)
        .select(col("event_id"), col("session_id"))
      val batch = graft.operators.Behavior
        .sessionize(real.toDF("user_id", "event_id", "ts"),
          idCol = "event_id")
        .select(col("event_id"), col("session_id"))
      assert(streamed.count() === 6, "every real event must be tagged exactly once")
      assert(streamed.exceptAll(batch).count() === 0 &&
        batch.exceptAll(streamed).count() === 0,
        "incremental session tags must equal the batch gaps-and-islands run")
      // the reorder really happened: e4 joined session 1#1, and the
      // later-session events broke correctly
      val m = streamed.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(m(4L) === "1#1" && m(2L) === "1#1" && m(5L) === "1#2" && m(6L) === "2#2")
    } finally q.stop()
  }

  test("streaming last-touch attribution INCREMENTALLY == batch as-of join") {
    // the sessionize discipline applied to Behavior.lastTouch: each
    // finalized conversion emits once with the same channel/touch_ts the
    // batch as-of join assigns — including an out-of-order touch that
    // lands between an older touch and an already-buffered conversion,
    // a same-timestamp channel tie, and an out-of-lookback organic
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val real = Seq(
      (1L, 10L, "click", ts("2024-01-01 10:00:00"), 0.0),
      (2L, 10L, "purchase", ts("2024-01-01 10:25:00"), 50.0),
      (4L, 20L, "click", ts("2024-01-01 09:00:00"), 0.0),
      (6L, 30L, "click", ts("2024-01-01 10:00:00"), 0.0),
      (7L, 30L, "view", ts("2024-01-01 10:00:00"), 0.0),
      (8L, 30L, "purchase", ts("2024-01-01 10:00:00"), 10.0), // tie -> view
      // batch 2: e3 arrives LATE (10:20 < the 10:25 max already seen)
      // but inside the allowance — it must become the attribution of
      // the already-buffered conversion e2
      (3L, 10L, "view", ts("2024-01-01 10:20:00"), 0.0),
      (5L, 20L, "purchase", ts("2024-01-01 11:00:00"), 70.0)) // 2h gap: organic
    val batches = Seq(real.take(6), real.drop(6),
      Seq((998L, 99L, "view", ts("2030-01-01 00:00:00"), 0.0)),
      Seq((999L, 99L, "view", ts("2030-01-02 00:00:00"), 0.0)))
    val input = MemoryStream[(Long, Long, String, java.sql.Timestamp, Double)]
    val events = input.toDF()
      .toDF("event_id", "user_id", "event_type", "ts", "value")
    val lookback = 1800L * 1000000L // 30 minutes
    val q = EventStreams.touchAttributions(spark, events, "purchase",
        Seq("click", "view"), lookback)
      .writeStream.outputMode("append").format("memory")
      .queryName("attrib_incr").start()
    try {
      batches.foreach { b => input.addData(b); q.processAllAvailable() }
      val streamed = spark.table("attrib_incr")
        .filter(col("user_id") =!= 99L)
        .select(col("event_id"), col("channel"),
          unix_micros(col("touch_ts")).as("tus"))
      val batch = graft.operators.Behavior.lastTouch(
          real.toDF("event_id", "user_id", "event_type", "ts", "value"),
          "purchase", Seq("click", "view"), lookback)
        .select(col("event_id"), col("channel"),
          unix_micros(col("touch_ts")).as("tus"))
      assert(streamed.count() === 3,
        "every real conversion must emit exactly once")
      assert(streamed.exceptAll(batch).count() === 0 &&
        batch.exceptAll(streamed).count() === 0,
        "incremental attribution must equal the batch as-of join")
      val m = streamed.collect()
        .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
      assert(m(2L) === Some("view"),
        "the late-arriving view must win over the earlier click")
      assert(m(5L) === None, "outside the lookback -> organic")
      assert(m(8L) === Some("view"), "same-ts tie resolves to max channel")
    } finally q.stop()
  }

  test("streaming linear attribution INCREMENTALLY == batch credit split") {
    // the multi-touch twin: each finalized conversion splits 1e6 micros
    // over its in-window touches with the batch operator's integral
    // division — including an out-of-order touch that joins the window
    // of an already-buffered conversion, a same-ts touch counted via
    // the at-or-before tie, and an out-of-lookback organic
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val real = Seq(
      (1L, 10L, "click", ts("2024-01-01 10:00:00"), 0.0),
      (2L, 10L, "click", ts("2024-01-01 10:10:00"), 0.0),
      (3L, 10L, "purchase", ts("2024-01-01 10:25:00"), 50.0),
      (6L, 30L, "view", ts("2024-01-01 10:00:00"), 0.0),
      (7L, 30L, "purchase", ts("2024-01-01 10:00:00"), 10.0), // tie counts
      // batch 2: e4 arrives LATE (10:20 < the 10:25 already seen) but in
      // the allowance — the buffered conversion e3 must split 3 ways
      (4L, 10L, "view", ts("2024-01-01 10:20:00"), 0.0),
      (5L, 20L, "purchase", ts("2024-01-01 11:00:00"), 70.0)) // organic
    val batches = Seq(real.take(5), real.drop(5),
      Seq((998L, 99L, "view", ts("2030-01-01 00:00:00"), 0.0)),
      Seq((999L, 99L, "view", ts("2030-01-02 00:00:00"), 0.0)))
    val input = MemoryStream[(Long, Long, String, java.sql.Timestamp, Double)]
    val events = input.toDF()
      .toDF("event_id", "user_id", "event_type", "ts", "value")
    val lookback = 1800L * 1000000L // 30 minutes
    val q = EventStreams.linearAttributions(spark, events, "purchase",
        Seq("click", "view"), lookback)
      .writeStream.outputMode("append").format("memory")
      .queryName("linattr_incr").start()
    try {
      batches.foreach { b => input.addData(b); q.processAllAvailable() }
      val streamed = spark.table("linattr_incr")
        .filter(col("user_id") =!= 99L)
        .select(col("event_id"), col("channel"), col("credit_m"))
      val batch = graft.operators.Behavior.linearAttribution(
          real.toDF("event_id", "user_id", "event_type", "ts", "value"),
          "purchase", Seq("click", "view"), lookback)
        .select(col("event_id"), col("channel"), col("credit_m"))
      assert(streamed.exceptAll(batch).count() === 0 &&
        batch.exceptAll(streamed).count() === 0,
        "incremental credit rows must equal the batch operator's")
      val m = streamed.collect()
        .map(r => (r.getLong(0), Option(r.getString(1))) -> r.getLong(2))
        .toMap
      // e3: 2 clicks + the late view of 3 touches; e7: same-ts view
      assert(m === Map(
        (3L, Some("click")) -> 666666L, (3L, Some("view")) -> 333333L,
        (7L, Some("view")) -> 1000000L, (5L, None) -> 1000000L))
    } finally q.stop()
  }

  test("streaming position attribution INCREMENTALLY == batch 40/20/40") {
    // the U-shaped twin: ordering by (touch_ts, channel), the 1/2/n-touch
    // conventions, an out-of-order touch that becomes the MIDDLE of an
    // already-buffered conversion's window (shifting who is last), and
    // an out-of-lookback organic
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val real = Seq(
      (1L, 10L, "click", ts("2024-01-01 10:00:00"), 0.0),
      (2L, 10L, "click", ts("2024-01-01 10:22:00"), 0.0),
      (3L, 10L, "purchase", ts("2024-01-01 10:25:00"), 50.0),
      (6L, 30L, "view", ts("2024-01-01 10:00:00"), 0.0),
      (7L, 30L, "click", ts("2024-01-01 10:00:00"), 0.0), // same-ts pair
      (8L, 30L, "purchase", ts("2024-01-01 10:00:00"), 10.0), // tie counts
      // batch 2: e4 lands LATE (10:20 < the 10:22 already seen, inside
      // the allowance) between e1 and e2 — the buffered e3 now has 3
      // touches: first click 40, middle view 20, last click 40
      (4L, 10L, "view", ts("2024-01-01 10:20:00"), 0.0),
      (5L, 20L, "purchase", ts("2024-01-01 11:00:00"), 70.0)) // organic
    val batches = Seq(real.take(6), real.drop(6),
      Seq((998L, 99L, "view", ts("2030-01-01 00:00:00"), 0.0)),
      Seq((999L, 99L, "view", ts("2030-01-02 00:00:00"), 0.0)))
    val input = MemoryStream[(Long, Long, String, java.sql.Timestamp, Double)]
    val events = input.toDF()
      .toDF("event_id", "user_id", "event_type", "ts", "value")
    val lookback = 1800L * 1000000L // 30 minutes
    val q = EventStreams.positionAttributions(spark, events, "purchase",
        Seq("click", "view"), lookback)
      .writeStream.outputMode("append").format("memory")
      .queryName("posattr_incr").start()
    try {
      batches.foreach { b => input.addData(b); q.processAllAvailable() }
      val streamed = spark.table("posattr_incr")
        .filter(col("user_id") =!= 99L)
        .select(col("event_id"), col("channel"), col("credit_m"))
      val batch = graft.operators.Behavior.positionAttribution(
          real.toDF("event_id", "user_id", "event_type", "ts", "value"),
          "purchase", Seq("click", "view"), lookback)
        .select(col("event_id"), col("channel"), col("credit_m"))
      assert(streamed.exceptAll(batch).count() === 0 &&
        batch.exceptAll(streamed).count() === 0,
        "incremental position credit must equal the batch operator's")
      val m = streamed.collect()
        .map(r => (r.getLong(0), Option(r.getString(1))) -> r.getLong(2))
        .toMap
      // e3: clicks first+last 800000, the late view middle 200000;
      // e8: same-ts (click, view) order by channel -> 500000 each
      assert(m === Map(
        (3L, Some("click")) -> 800000L, (3L, Some("view")) -> 200000L,
        (8L, Some("click")) -> 500000L, (8L, Some("view")) -> 500000L,
        (5L, None) -> 1000000L))
    } finally q.stop()
  }

  test("streaming time-decay attribution INCREMENTALLY == batch " +
      "half-life weights, incl. the 1-micro ancient-touch floor") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // half-life 1 minute, lookback 30 minutes (30 half-lives: the
    // >=20-half-life touches exercise the clamp on both sides)
    val real = Seq(
      (1L, 10L, "click", ts("2024-01-01 10:00:00"), 0.0), // k=25: w=1
      (2L, 10L, "view", ts("2024-01-01 10:24:00"), 0.0),  // k=1: w=500000
      (3L, 10L, "purchase", ts("2024-01-01 10:25:00"), 50.0),
      (6L, 30L, "view", ts("2024-01-01 10:00:00"), 0.0),
      (7L, 30L, "purchase", ts("2024-01-01 10:00:00"), 10.0), // tie: k=0
      // batch 2: e4 lands LATE inside e3's already-buffered window
      (4L, 10L, "click", ts("2024-01-01 10:23:00"), 0.0), // k=2: w=250000
      (5L, 20L, "purchase", ts("2024-01-01 11:00:00"), 70.0)) // organic
    val batches = Seq(real.take(5), real.drop(5),
      Seq((998L, 99L, "view", ts("2030-01-01 00:00:00"), 0.0)),
      Seq((999L, 99L, "view", ts("2030-01-02 00:00:00"), 0.0)))
    val input = MemoryStream[(Long, Long, String, java.sql.Timestamp, Double)]
    val events = input.toDF()
      .toDF("event_id", "user_id", "event_type", "ts", "value")
    val lookback = 1800L * 1000000L
    val halfLife = 60L * 1000000L
    val q = EventStreams.timeDecayAttributions(spark, events, "purchase",
        Seq("click", "view"), lookback, halfLife)
      .writeStream.outputMode("append").format("memory")
      .queryName("tdattr_incr").start()
    try {
      batches.foreach { b => input.addData(b); q.processAllAvailable() }
      val streamed = spark.table("tdattr_incr")
        .filter(col("user_id") =!= 99L)
        .select(col("event_id"), col("channel"), col("credit_m"))
      val batch = graft.operators.Behavior.timeDecayAttribution(
          real.toDF("event_id", "user_id", "event_type", "ts", "value"),
          "purchase", Seq("click", "view"), lookback, halfLife)
        .select(col("event_id"), col("channel"), col("credit_m"))
      assert(streamed.exceptAll(batch).count() === 0 &&
        batch.exceptAll(streamed).count() === 0,
        "incremental time-decay credit must equal the batch operator's")
      val m = streamed.collect()
        .map(r => (r.getLong(0), Option(r.getString(1))) -> r.getLong(2))
        .toMap
      // e3: tw = 1 + 500000 + 250000 = 750001; click (1 + 250000),
      // view 500000 — the ancient click still carries its floor micro
      assert(m === Map(
        (3L, Some("click")) -> (250001L * 1000000L / 750001L),
        (3L, Some("view")) -> (500000L * 1000000L / 750001L),
        (7L, Some("view")) -> 1000000L, (5L, None) -> 1000000L))
    } finally q.stop()
  }

  test("streaming preference counts INCREMENTALLY == batch pair counts") {
    // the RLHF-data twin: pairwise win counters are monotone sums, so
    // the complete-mode aggregation must equal the batch pairCounts
    // after any batch split — including a judgment arriving for an
    // already-seen pair and a self/null judgment that must drop
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val real = Seq(
      ("a", "b"), ("b", "c"), ("a", "b"),
      ("b", "a"), ("c", "a"), ("a", "a"),
      (null.asInstanceOf[String], "b"), ("c", "b"))
    val batches = Seq(real.take(3), real.drop(3))
    val input = MemoryStream[(String, String)]
    val prefs = input.toDF().toDF("winner", "loser")
    val q = EventStreams.preferenceCounts(spark, prefs, "winner", "loser")
      .writeStream.outputMode("complete").format("memory")
      .queryName("prefcounts_incr").start()
    try {
      batches.foreach { b => input.addData(b); q.processAllAvailable() }
      val streamed = spark.table("prefcounts_incr")
      val batch = graft.operators.Preferences.pairCounts(
        real.toDF("winner", "loser"), "winner", "loser")
      assert(streamed.exceptAll(batch).count() === 0 &&
        batch.exceptAll(streamed).count() === 0,
        "incremental pair counts must equal the batch operator's")
      val m = streamed.collect().map(r => (r.getString(0), r.getString(1))
        -> ((r.getLong(2), r.getLong(3)))).toMap
      assert(m === Map(("a", "b") -> ((2L, 1L)),
        ("b", "c") -> ((1L, 1L)), ("a", "c") -> ((0L, 1L))))
    } finally q.stop()
  }

  test("streaming reward top-k INCREMENTALLY == batch bestOfN") {
    // the rejection-sampling twin: the bounded top-k buffer is a
    // monotone order-independent reduction, so the complete-mode state
    // after any batch split must equal the batch bestOfN relation —
    // including a LATE better sample displacing a kept one, a reward
    // tie resolving to the lower response id across batches, and a
    // null-reward sample that must drop
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val real = Seq(
      ("p1", 10L, Option(100000L)), ("p1", 11L, Option(300000L)),
      ("p2", 21L, Option(500000L)),
      // batch 2: late arrivals reshape p1's kept set; p2's tie must
      // resolve to the LOWER id though it arrived second
      ("p1", 12L, Option(400000L)), ("p2", 20L, Option(500000L)),
      ("p1", 13L, Option(50000L)), ("p2", 22L, Option.empty[Long]))
    val batches = Seq(real.take(3), real.drop(3))
    val input = MemoryStream[(String, Long, Option[Long])]
    val samples = input.toDF().toDF("prompt", "resp", "reward")
    val q = EventStreams.rewardTopK(spark, samples, "prompt", "resp",
        "reward", k = 2)
      .writeStream.outputMode("complete").format("memory")
      .queryName("rtopk_incr").start()
    try {
      batches.foreach { b => input.addData(b); q.processAllAvailable() }
      val derived = spark.table("rtopk_incr")
        .select(col("prompt"), col("n_samples"),
          posexplode(col("top")).as(Seq("pos", "t")))
        .select(col("prompt"), (col("pos") + 1).cast("long").as("rank"),
          col("t.id").as("resp"),
          col("t.score").cast("long").as("reward_micros"),
          col("n_samples"))
      val batch = graft.operators.Preferences.bestOfN(
        real.toDF("prompt", "resp", "reward"),
        "prompt", "resp", "reward", k = 2)
      assert(derived.exceptAll(batch).count() === 0 &&
        batch.exceptAll(derived).count() === 0,
        "streamed top-k buffers must equal the batch bestOfN relation")
      val kept = derived.collect()
        .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(kept(("p1", 1L)) === 12L && kept(("p1", 2L)) === 11L,
        "the late 400k sample displaced the early 100k one")
      assert(kept(("p2", 1L)) === 20L,
        "the tie resolves to the lower id though it arrived later")
    } finally q.stop()
    // the 2^53 reward-magnitude guard matches the batch bestOfN's
    // (same exactness bound for the double-scored buffer)
    val huge = Seq(("p1", 10L, 9007199254740993L))
      .toDF("prompt", "resp", "reward")
    val ex = intercept[Exception](EventStreams.rewardTopK(
      spark, huge, "prompt", "resp", "reward", 1).collect())
    assert(ex.getMessage.contains("2^53"))
  }

  test("streaming embedding dim-stats INCREMENTALLY derive the batch " +
      "drift numbers") {
    // the monitoring twin: per-dim running sums are monotone, so the
    // complete-mode state after any batch split must derive the SAME
    // (n_b, msq_b_micros, centroid_cos_micros) the batch embeddingDrift
    // reports against a fixed reference batch — including an empty and
    // a null vector that must not dilute anything
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ref = Seq((0L, Seq(1f, 0f)), (1L, Seq(1f, 0f)), (2L, Seq(0.8f, 0.6f)))
      .toDF("vec_id", "embedding")
    val streamed = Seq(
      Seq((10L, Option(Seq(0.9f, 0.1f))), (11L, Option(Seq(1f, 1f)))),
      Seq((12L, Option(Seq(2f, 0f))), (13L, Option(Seq.empty[Float])),
        (14L, Option.empty[Seq[Float]])))
    val input = MemoryStream[(Long, Option[Seq[Float]])]
    val q = EventStreams.embeddingDimStats(spark,
        input.toDF().toDF("vec_id", "embedding"))
      .writeStream.outputMode("complete").format("memory")
      .queryName("dimstats_incr").start()
    try {
      streamed.foreach { b => input.addData(b); q.processAllAvailable() }
      val st = spark.table("dimstats_incr")
        .collect().map(r => r.getInt(0) ->
          ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
      // batch truth against the same reference
      val batchB = streamed.flatten.toDF("vec_id", "embedding")
      val want = graft.operators.Similarity.embeddingDrift(ref, batchB)
        .head
      // n_b = any dim's count (empty + null vectors excluded)
      assert(st(0)._1 === want.getLong(1) && st(0)._1 === 3L)
      // msq from Σ_dims s2: round-6 exact-micro recipe
      val msq = BigDecimal((st(0)._3 + st(1)._3) / st(0)._1)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP)
      assert((msq * 1000000).toLong === want.getLong(3))
      // centroid cosine from derived per-dim means (float discipline)
      def c(s1: Double, n: Long): Double =
        BigDecimal(s1 / n).setScale(6,
          BigDecimal.RoundingMode.HALF_UP).toFloat.toDouble
      val (bx, by) = (c(st(0)._2, st(0)._1), c(st(1)._2, st(1)._1))
      val refRows = Seq((1.0, 0.0), (1.0, 0.0), (0.8f.toDouble,
        0.6f.toDouble))
      def refC(i: Int) = {
        val s = refRows.map(r => if (i == 0) r._1 else r._2).sum
        BigDecimal(s / refRows.size).setScale(6,
          BigDecimal.RoundingMode.HALF_UP).toFloat.toDouble
      }
      val (ax, ay) = (refC(0), refC(1))
      val cos = (ax * bx + ay * by) /
        (math.sqrt(ax * ax + ay * ay) * math.sqrt(bx * bx + by * by))
      val cosM = math.round(BigDecimal(cos).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble * 1e6)
      assert(cosM === want.getLong(4),
        "centroid cosine derived from streamed state == batch drift")
    } finally q.stop()
  }

  test("streaming token-count state INCREMENTALLY derives the batch " +
      "token-KL drift numbers at every batch split") {
    // the corpus-refresh twin: per-token counts are monotone, so the
    // complete-mode state after EACH batch must feed tokenKlFromCounts
    // to exactly the numbers batch tokenKlDrift reports for the same
    // prefix — including a null text that must not count
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ref = Seq((1L, Option("a a b c")), (2L, Option("a b")))
      .toDF("doc_id", "text")
    val streamed = Seq(
      Seq((10L, Option("a z z")), (11L, Option.empty[String])),
      Seq((12L, Option("b c c z")), (13L, Option("a a"))))
    val input = MemoryStream[(Long, Option[String])]
    val q = EventStreams.tokenCountState(spark,
        input.toDF().toDF("doc_id", "text"))
      .writeStream.outputMode("complete").format("memory")
      .queryName("tokcnt_incr").start()
    try {
      val refCounts = EventStreams.tokenCountState(spark, ref)
      streamed.indices.foreach { i =>
        input.addData(streamed(i)); q.processAllAvailable()
        val derived = graft.operators.TextAnalysis.tokenKlFromCounts(
          refCounts, spark.table("tokcnt_incr")).head
        val want = graft.operators.TextAnalysis.tokenKlDrift(ref,
          streamed.take(i + 1).flatten.toDF("doc_id", "text")).head
        assert(derived.toSeq === want.toSeq,
          s"streamed state after batch $i must derive the batch KL " +
            "numbers bit-for-bit")
      }
      // and the drift is non-degenerate evidence, not a vacuous zero
      val fin = graft.operators.TextAnalysis.tokenKlFromCounts(
        refCounts, spark.table("tokcnt_incr")).head
      assert(fin.getLong(3) > 0L && fin.getLong(4) > 0L)
    } finally q.stop()
  }

  test("streaming PSI bin counters INCREMENTALLY derive the batch " +
      "psiDrift numbers at every batch split") {
    // the last untwinned drift monitor: per-bin counts against the
    // baseline's FROZEN cuts are monotone, so the complete-mode state
    // after EACH batch must feed psiFromCounts to exactly the relation
    // batch psiDrift reports for the same prefix — including a null
    // value that must not count and an out-of-range value that lands
    // in an edge bin
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = Seq(Option(1.0), Option(2.0), Option(3.0), Option(4.0),
      Option(5.0), Option(6.0), Option(7.0), Option(8.0),
      Option.empty[Double]).toDF("v")
    val cuts = graft.operators.Profile.psiCuts(base, "v", 4)
    assert(cuts.length === 3)
    val streamed = Seq(
      Seq(Option(0.5), Option(2.5), Option.empty[Double]),
      Seq(Option(9.0), Option(3.5), Option(2.1), Option(7.5)))
    val input = MemoryStream[Option[Double]]
    val q = EventStreams.binCountState(spark,
        input.toDF().toDF("v"), "v", cuts)
      .writeStream.outputMode("complete").format("memory")
      .queryName("psi_incr").start()
    try {
      streamed.indices.foreach { i =>
        input.addData(streamed(i)); q.processAllAvailable()
        val derived = graft.operators.Profile.psiFromCounts(
          graft.operators.Profile.psiBinCounts(base, "v", cuts),
          spark.table("psi_incr"), 4)
        val want = graft.operators.Profile.psiDrift(base,
          streamed.take(i + 1).flatten.toDF("v"), "v", 4)
        assert(derived.exceptAll(want).count() === 0 &&
          want.exceptAll(derived).count() === 0,
          s"streamed bin counters after batch $i must derive the batch " +
            "PSI relation bit-for-bit")
      }
      // and the drift is non-degenerate evidence: the streamed batch
      // skews low/high, so at least one bin contributes positive PSI
      val fin = graft.operators.Profile.psiFromCounts(
        graft.operators.Profile.psiBinCounts(base, "v", cuts),
        spark.table("psi_incr"), 4).collect()
      assert(fin.length === 4 && fin.map(_.getDouble(3)).sum > 0.0)
    } finally q.stop()
  }

  test("streaming KTO verdict counters INCREMENTALLY derive the batch " +
      "unpaired-preference signal at every batch split") {
    // live thumbs-up/down: per-prompt (n, n_desirable) are monotone
    // counters; joining the accumulated examples against the streamed
    // state through ktoSignalFromCounts must reproduce the batch
    // ktoSignal relation exactly — including a degenerate prompt that
    // only becomes contested once the second batch lands
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val streamed = Seq(
      Seq(("p1", 1L, Option(true)), ("p1", 2L, Option(true)),
        ("p2", 3L, Option(true))),  // p1 looks all-desirable so far
      Seq(("p1", 4L, Option(false)), ("p2", 5L, Option(true)),
        ("p1", 9L, Option.empty[Boolean])))
    val input = MemoryStream[(String, Long, Option[Boolean])]
    val q = EventStreams.ktoVerdictCounts(spark,
        input.toDF().toDF("prompt", "resp", "up"), "prompt", "resp", "up")
      .writeStream.outputMode("complete").format("memory")
      .queryName("kto_incr").start()
    try {
      streamed.indices.foreach { i =>
        input.addData(streamed(i)); q.processAllAvailable()
        val sofar = streamed.take(i + 1).flatten
          .toDF("prompt", "resp", "up")
        val derived = graft.operators.Preferences.ktoSignalFromCounts(
          sofar, spark.table("kto_incr"), "prompt", "resp", "up")
        val batch = graft.operators.Preferences.ktoSignal(
          sofar, "prompt", "resp", "up")
        assert(derived.exceptAll(batch).count() === 0 &&
          batch.exceptAll(derived).count() === 0,
          s"streamed counters after batch $i must derive the batch " +
            "signal relation")
      }
      // the batch-2 flip is real evidence: p1's baseline left 1e6
      val fin = graft.operators.Preferences.ktoSignalFromCounts(
        streamed.flatten.toDF("prompt", "resp", "up"),
        spark.table("kto_incr"), "prompt", "resp", "up")
        .collect().map(r => r.getLong(1) -> r.getLong(6)).toMap
      assert(fin(1L) === 666667L && fin(4L) === 666667L,
        "p1 contested after the second batch: baseline (2*2e6+3) div 6")
    } finally q.stop()
  }

  test("streaming answer-vote counts INCREMENTALLY derive the batch " +
      "self-consistency verdicts") {
    // the eval twin: per-(question, answer) tallies are monotone sums;
    // the complete-mode counters after any batch split must derive the
    // SAME mode/vote/verdict relation the batch operator computes —
    // including a tie resolved lexicographically and abstentions
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val real = Seq(
      ("q1", Option("a"), "a"), ("q1", Option("b"), "a"),
      ("q1", Option("a"), "a"),
      ("q2", Option("x"), "y"), ("q2", Option("y"), "y"),
      ("q2", Option("y"), "y"), ("q2", Option("x"), "y"), // tie 2-2
      ("q3", Option.empty[String], "z"), ("q3", Option("z"), "z"))
    val batches = Seq(real.take(4), real.drop(4))
    val input = MemoryStream[(String, Option[String], String)]
    val samples = input.toDF().toDF("q", "ans", "gold")
    val q = EventStreams.answerVoteCounts(spark, samples, "q", "ans")
      .writeStream.outputMode("complete").format("memory")
      .queryName("votes_incr").start()
    try {
      batches.foreach { b => input.addData(b); q.processAllAvailable() }
      val counts = spark.table("votes_incr")
      // derive the verdict relation from the streamed counters (the
      // batch mode/tiebreak arithmetic over the bounded counter table)
      val golds = real.map(r => (r._1, r._3)).distinct.toDF("q", "gold")
      val voted = counts.filter(col("answer").isNotNull)
        .groupBy(col("q"))
        .agg(min(struct((-col("votes")).as("__nv"), col("answer")))
          .as("__m"),
          sum(col("votes")).as("n"),
          count(lit(1)).as("n_distinct"))
        .select(col("q"), col("n"), col("n_distinct"),
          col("__m.answer").as("mode_answer"),
          (-col("__m.__nv")).as("__mv"))
      val derived = golds
        .join(counts.filter(col("answer").isNull)
          .select(col("q"), col("votes").as("n_null")), Seq("q"), "left")
        .na.fill(0L, Seq("n_null"))
        .join(voted, Seq("q"), "left")
        .select(col("q"), coalesce(col("n"), lit(0L)).as("n"),
          col("n_null"),
          coalesce(col("n_distinct"), lit(0L)).as("n_distinct"),
          col("mode_answer"),
          when(col("n") > 0, expr(
            "CAST((2 * CAST(__mv AS DECIMAL(38,0)) * 1000000 + n) " +
              "div (2 * n) AS BIGINT)")).as("vote_ppm"),
          coalesce(col("mode_answer") === col("gold"), lit(false))
            .as("correct"))
      val batch = graft.operators.Profile.selfConsistency(
        real.toDF("q", "ans", "gold"), "q", "ans", "gold")
      assert(derived.exceptAll(batch).count() === 0 &&
        batch.exceptAll(derived).count() === 0,
        "streamed counters must derive the batch verdicts exactly " +
          "(incl. the q2 tie resolving to 'x' and q3's abstention)")
    } finally q.stop()
  }

  test("streaming transitions INCREMENTALLY == batch Markov counts") {
    // the path-analysis twin: per-user consecutive pairs emit once the
    // later event finalizes — including an out-of-order arrival that
    // lands BETWEEN two buffered events (the implied pair must re-split
    // around it) and a same-ts pair ordered by event_id
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val real = Seq(
      (1L, 10L, "a", ts("2024-01-01 10:00:00")),
      (3L, 10L, "b", ts("2024-01-01 10:10:00")),
      (5L, 20L, "a", ts("2024-01-01 10:00:00")),
      (6L, 20L, "a", ts("2024-01-01 10:00:00")), // same ts: id order
      // batch 2: e2 arrives LATE between buffered e1 and e3 — the pair
      // stream must read a->c, c->b, never a->b
      (2L, 10L, "c", ts("2024-01-01 10:05:00")),
      (7L, 20L, "b", ts("2024-01-01 10:30:00")))
    val batches = Seq(real.take(4), real.drop(4),
      Seq((998L, 99L, "x", ts("2030-01-01 00:00:00"))),
      Seq((999L, 99L, "x", ts("2030-01-02 00:00:00"))))
    val input = MemoryStream[(Long, Long, String, java.sql.Timestamp)]
    val events = input.toDF().toDF("event_id", "user_id", "event_type", "ts")
    val q = EventStreams.transitionEvents(spark, events)
      .writeStream.outputMode("append").format("memory")
      .queryName("markov_incr").start()
    try {
      batches.foreach { b => input.addData(b); q.processAllAvailable() }
      val streamed = spark.table("markov_incr")
        .filter(col("user_id") =!= 99L)
        .groupBy(col("from_type"), col("to_type"))
        .agg(count(lit(1)).as("n"))
        .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
        .toMap
      val batch = graft.operators.Behavior.markovTransitions(
          real.toDF("event_id", "user_id", "event_type", "ts"),
          "user_id", "event_type", "ts", "event_id")
        .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
        .toMap
      assert(streamed === batch,
        "incremental transition counts must equal the batch operator's")
      assert(streamed === Map(("a", "c") -> 1L, ("c", "b") -> 1L,
        ("a", "a") -> 1L, ("a", "b") -> 1L))
    } finally q.stop()
  }

  test("streaming funnel reach INCREMENTALLY == batch funnel counts") {
    // the other half of the funnel/sessionize parity pair: the streaming
    // per-user state machine must reproduce the batch operator's
    // strictly-after + deadline semantics, including an out-of-order
    // step-1 arrival that unlocks a buffered step-2 event
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val steps = Seq("view", "cart", "buy")
    val real = Seq(
      // batch 1 — u1's cart arrives BEFORE its view in arrival order but
      // after it in event time (out-of-order test); u2 views then carts
      // at the SAME instant, so strictly-after must fail in the fold
      (1L, 1L, "cart", ts("2024-01-01 10:05:00")),
      (1L, 2L, "view", ts("2024-01-01 10:00:00")),
      (2L, 4L, "view", ts("2024-01-01 10:00:00")),
      (2L, 5L, "cart", ts("2024-01-01 10:00:00")),
      // batch 2 — u1 buys within the 20-min deadline of its 10:05 cart;
      // u3 carts past the deadline (never reaches stage 2); u4 carts
      // without viewing (reaches nothing); noise type prunes map-side
      (1L, 3L, "buy", ts("2024-01-01 10:20:00")),
      (3L, 6L, "view", ts("2024-01-01 10:00:00")),
      (3L, 7L, "cart", ts("2024-01-01 10:45:00")),
      (4L, 8L, "cart", ts("2024-01-01 10:10:00")),
      (1L, 9L, "noise", ts("2024-01-01 10:01:00")))
    val batches = Seq(real.take(4), real.drop(4),
      Seq((99L, 998L, "view", ts("2030-01-01 00:00:00"))),
      Seq((99L, 999L, "view", ts("2030-01-02 00:00:00"))))
    val input = MemoryStream[(Long, Long, String, java.sql.Timestamp)]
    val events = input.toDF().toDF("user_id", "event_id", "event_type", "ts")
    val q = EventStreams.funnelReach(spark, events, steps,
        withinSeconds = Some(1200L))
      .writeStream.outputMode("append").format("memory")
      .queryName("funnel_incr").start()
    try {
      batches.foreach { b => input.addData(b); q.processAllAvailable() }
      val streamed = spark.table("funnel_incr")
        .filter(col("user_id") =!= 99L)
      val streamedCounts = streamed.groupBy(col("step"), col("event_type"))
        .agg(count(lit(1)).as("users"))
      val batch = graft.operators.Behavior.funnel(
          real.toDF("user_id", "event_id", "event_type", "ts"),
          steps, withinSeconds = Some(1200L))
        .filter(col("users") > 0) // reach records exist only for reached stages
        .select(col("step"), col("event_type"), col("users"))
      assert(streamedCounts.exceptAll(batch).count() === 0 &&
        batch.exceptAll(streamedCounts).count() === 0,
        "incremental funnel reach must equal the batch counts")
      // the per-user detail: u1 full funnel, u2/u3 stop at view, u4 none
      val reach = streamed.collect()
        .groupBy(_.getAs[Long]("user_id"))
        .view.mapValues(_.map(_.getAs[Int]("step")).sorted.toSeq).toMap
      assert(reach === Map(1L -> Seq(1, 2, 3), 2L -> Seq(1), 3L -> Seq(1)))
    } finally q.stop()
  }

  test("streaming retention: cohort pins to the first FINALIZED week, late events drop") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // 2024-01-01 is a Monday. Tight 1-hour allowance: after batch 2's
    // sentinel-free advance, u1's week-0 activity is final; the week-0
    // event arriving in batch 3 (far below the watermark) must DROP,
    // not re-emit or shift the cohort.
    val input = MemoryStream[(Long, Long, String, java.sql.Timestamp)]
    val events = input.toDF().toDF("user_id", "event_id", "event_type", "ts")
    val q = EventStreams.retentionCells(spark, events, watermark = "1 hour")
      .writeStream.outputMode("append").format("memory")
      .queryName("ret_incr").start()
    try {
      Seq(
        // u1 active in week 0 and TWICE in week 2 — both week-2 events
        // finalize together, so the second must hit the emitted-offset
        // dedup branch and produce no duplicate cell
        Seq((1L, 1L, "view", ts("2024-01-02 10:00:00")),
          (1L, 2L, "view", ts("2024-01-16 10:00:00")),
          (1L, 4L, "view", ts("2024-01-17 09:00:00"))),
        // watermark advances far past week 2 → everything above is final
        Seq((99L, 998L, "view", ts("2024-03-01 00:00:00"))),
        // a week-0 straggler for u1: below the watermark → dropped, the
        // cohort must not shift and offset 0 must not re-emit
        Seq((1L, 3L, "view", ts("2024-01-03 09:00:00"))),
        Seq((99L, 999L, "view", ts("2024-03-02 00:00:00"))),
        Seq((99L, 997L, "view", ts("2024-03-03 00:00:00")))
      ).foreach { b => input.addData(b); q.processAllAvailable() }
      val got = spark.table("ret_incr").filter(col("user_id") === 1L)
        .collect()
        .map(r => (r.getDate(1).toString, r.getInt(2))).sorted.toSeq
      assert(got === Seq(("2024-01-01", 0), ("2024-01-01", 2)),
        "u1: cohort week 2024-01-01, offsets 0 and 2, each emitted once")
    } finally q.stop()
  }

  test("streaming retention: the engine drops pre-1970 events at the initial watermark (documented boundary)") {
    // Spark's late-row filter runs upstream of flatMapGroupsWithState
    // against the INITIAL watermark of 0 (= 1970-01-01), so pre-epoch
    // events in the first batches never reach the state function — an
    // engine watermark-model property the operator scaladoc documents.
    // This pin exists so a Spark behavior change (or an accidental
    // second phantom boundary in OUR state machines) is caught loudly.
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val input = MemoryStream[(Long, Long, String, java.sql.Timestamp)]
    val events = input.toDF().toDF("user_id", "event_id", "event_type", "ts")
    val q = EventStreams.retentionCells(spark, events, watermark = "1 hour")
      .writeStream.outputMode("append").format("memory")
      .queryName("ret_pre1970").start()
    try {
      Seq(
        // the pre-epoch event is engine-dropped; the 1970-02 event in
        // the SAME first batch (no watermark yet) must survive and
        // cohort normally — proving our state function itself imposes
        // no phantom initial boundary
        Seq((1L, 1L, "view", ts("1969-12-02 10:00:00")),
          (2L, 2L, "view", ts("1970-02-03 10:00:00"))),
        Seq((99L, 998L, "view", ts("1970-06-01 00:00:00"))),
        Seq((99L, 999L, "view", ts("1970-06-02 00:00:00"))),
        Seq((99L, 997L, "view", ts("1970-06-03 00:00:00")))
      ).foreach { b => input.addData(b); q.processAllAvailable() }
      val byUser = spark.table("ret_pre1970").filter(col("user_id") =!= 99L)
        .collect().map(r => (r.getLong(0), r.getDate(1).toString, r.getInt(2)))
        .toSeq.sorted
      assert(byUser === Seq((2L, "1970-02-02", 0)),
        "pre-epoch event engine-dropped; the epoch-era event in the " +
          "same no-watermark batch cohorts to its Monday week")
    } finally q.stop()
  }

  test("stream-static dimension enrichment == batch enrichment") {
    val dim = EventStreams.segmentDim(
      spark.read.parquet(s"$dir/customer.parquet"))
    val q = EventStreams.runToMemory(
      EventStreams.enrichedSegmentCounts(
        EventStreams.readEvents(spark, path), dim),
      "enrich_out", "complete")
    try {
      val streamed = spark.table("enrich_out")
      val batch = SparkEntry.queries("q_e7_dim_enrichment")(spark, dir)
      assert(streamed.count() === batch.count())
      assert(streamed.exceptAll(batch).count() === 0)
      assert(batch.exceptAll(streamed).count() === 0)
    } finally q.stop()
  }

  test("streaming anomaly flags vs history moments == batch run of the operator") {
    val ev = graft.sources.Tables.events(spark, dir)
      .select(col("event_id"), col("user_id"), col("value"))
    val mom = graft.operators.Anomaly.moments(
      ev.filter(col("event_id") % 2 === 0), "user_id", "value")
    // stateless stream-static left join: append mode, no watermark
    val q = EventStreams.runToMemory(
      EventStreams.anomalyFlags(EventStreams.readEvents(spark, path), mom),
      "anomaly_out", "append")
    try {
      val streamed = spark.table("anomaly_out")
      val batch = SparkEntry.queries("q_e13_stream_anomaly")(spark, dir)
      assert(streamed.count() === batch.count())
      assert(streamed.exceptAll(batch).count() === 0)
      assert(batch.exceptAll(streamed).count() === 0)
      // the flagged set is non-trivial in both directions
      assert(streamed.filter(col("is_anomaly")).count() > 0)
      assert(streamed.filter(!col("is_anomaly")).count() > 0)
    } finally q.stop()
  }

  test("stream-static enrichment: the dim snapshots at query start; a restart rolls it") {
    // pins the operational contract the operator documents: a running
    // query keeps the dimension it started with (an in-place parquet
    // overwrite fails the next batch on a stale file index — observed
    // with AND without refreshByPath, since the captured plan holds the
    // old listing); rolling a new dimension = restart the query with a
    // re-read dim, which checkpointed sinks make exactly-once
    import spark.implicits._
    val dimPath = java.nio.file.Files.createTempDirectory("graft-dim").toString + "/dim"
    Seq((13L, "OLDSEG")).toDF("user_id", "segment")
      .write.mode("overwrite").parquet(dimPath)
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, java.sql.Timestamp, Double)]
    val events = input.toDF().toDF("user_id", "ts", "value")
    def start(name: String) = EventStreams.enrichedSegmentCounts(
        events, spark.read.parquet(dimPath))
      .writeStream.outputMode("complete").format("memory")
      .queryName(name).start()
    def segs(name: String) = spark.table(name)
      .select("segment").collect().map(_.getString(0)).toSet
    val q1 = start("dim_v1_out")
    try {
      input.addData((13L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), 1.0))
      q1.processAllAvailable()
      assert(segs("dim_v1_out") === Set("OLDSEG"))
    } finally q1.stop()
    Seq((13L, "NEWSEG")).toDF("user_id", "segment")
      .write.mode("overwrite").parquet(dimPath)
    spark.catalog.refreshByPath(dimPath)
    val q2 = start("dim_v2_out")
    try {
      input.addData((13L, java.sql.Timestamp.valueOf("2024-01-01 12:00:00"), 1.0))
      q2.processAllAvailable()
      assert(segs("dim_v2_out") === Set("NEWSEG"),
        s"restarted query must join the rolled dim: ${segs("dim_v2_out")}")
    } finally q2.stop()
  }

  test("dropDuplicatesWithinWatermark emits each event_id once") {
    val q = EventStreams.runToMemory(
      EventStreams.dedupEvents(EventStreams.readEvents(spark, path)),
      "dedup_out", "append")
    try {
      val streamed = spark.table("dedup_out")
      val expected = spark.read.parquet(path)
        .select(countDistinct(col("event_id"))).head.getLong(0)
      assert(streamed.count() === expected)
      assert(streamed.select(countDistinct(col("event_id"))).head.getLong(0) === expected)
    } finally q.stop()
  }

  test("watermarked stream-stream interval join == batch interval join") {
    val q = EventStreams.runToMemory(
      EventStreams.clickErrorJoin(EventStreams.readEvents(spark, path)),
      "ssjoin_out", "append")
    try {
      val streamed = spark.table("ssjoin_out")
      val e = sources.Tables.events(spark, dir)
      val clicks = e.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id"),
          col("ts").as("click_ts"))
      val errors = e.filter(col("event_type") === "error")
        .select(col("user_id").as("err_user"), col("ts").as("err_ts"))
      val batch = clicks.join(errors,
        col("user_id") === col("err_user") &&
          col("err_ts") <= col("click_ts") &&
          col("err_ts") >= col("click_ts") - expr("INTERVAL 10 minutes"))
        .select(col("click_id"), col("user_id"), col("click_ts"), col("err_ts"))
      assert(streamed.count() === batch.count())
      assert(streamed.exceptAll(batch).count() === 0)
      assert(batch.exceptAll(streamed).count() === 0)
    } finally q.stop()
  }

  test("checkpoint recovery: restart resumes from the checkpoint, no re-processing") {
    import java.nio.file.{Files, Paths}
    // self-contained when run with -z: the nanos conf is otherwise only
    // set once another test touches readEvents first
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val srcDir = Files.createTempDirectory("graft-ckpt-src")
    val outDir = Files.createTempDirectory("graft-ckpt-out").toString + "/out"
    val ckpt = Files.createTempDirectory("graft-ckpt-meta").toString
    Files.copy(Paths.get(s"$dir/events.parquet"), srcDir.resolve("batch1.parquet"))
    val perFile = spark.read.parquet(s"$dir/events.parquet").count()

    def startQuery() = EventStreams.readEvents(spark, srcDir.toString)
      .select(col("event_id"), col("event_type"))
      .writeStream.format("parquet")
      .option("path", outDir).option("checkpointLocation", ckpt)
      .outputMode("append").start()

    val q1 = startQuery()
    q1.processAllAvailable(); q1.stop()
    assert(spark.read.parquet(outDir).count() === perFile)

    // second file lands while the query is down; restart from checkpoint
    Files.copy(Paths.get(s"$dir/events.parquet"), srcDir.resolve("batch2.parquet"))
    val q2 = startQuery()
    q2.processAllAvailable(); q2.stop()
    // exactly one more file's worth: batch1 was NOT re-processed
    assert(spark.read.parquet(outDir).count() === 2 * perFile)
  }

  test("rate source: ProcessingTime steady-state, then AvailableNow restart resumes offsets") {
    import org.apache.spark.sql.streaming.Trigger
    // the memory sink refuses checkpoint recovery; the parquet sink is the
    // transactional one (exactly-once via its _spark_metadata log), which
    // is exactly what makes resume observable: ids must stay gapless AND
    // duplicate-free across the restart
    val ckpt = java.nio.file.Files.createTempDirectory("graft-rate-ckpt").toString
    val outDir = java.nio.file.Files.createTempDirectory("graft-rate-out").toString + "/out"
    val src = EventStreams.rateEvents(spark, 500).select(col("event_id"))
    def sinkTo(trigger: Trigger) =
      src.writeStream.format("parquet").option("path", outDir)
        .option("checkpointLocation", ckpt)
        .outputMode("append").trigger(trigger).start()

    // steady-state leg: micro-batches on a ProcessingTime cadence
    val q1 = sinkTo(Trigger.ProcessingTime("250 milliseconds"))
    val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
    def committed() =
      try spark.read.parquet(outDir).count() catch { case _: Exception => 0L }
    while (committed() == 0L && System.nanoTime() < deadline) Thread.sleep(100)
    q1.processAllAvailable(); q1.stop()
    val max1 = spark.read.parquet(outDir).agg(max(col("event_id"))).head.getLong(0)

    // catch-up leg: AvailableNow drains what accrued while down, then stops
    Thread.sleep(1200) // let the rate source accrue rows while "down"
    val q2 = sinkTo(Trigger.AvailableNow())
    assert(q2.awaitTermination(60000), "AvailableNow run did not self-terminate")
    val all = spark.read.parquet(outDir)
      .agg(count(lit(1)), countDistinct(col("event_id")),
        min(col("event_id")), max(col("event_id"))).head
    assert(all.getLong(3) > max1, "restart processed no new rows")
    // resumed exactly after the committed offset: 0..max, no gap (would
    // mean skipped offsets), no duplicate (would mean re-processing)
    assert(all.getLong(2) === 0L)
    assert(all.getLong(0) === all.getLong(1), "duplicate ids: batch re-processed")
    assert(all.getLong(0) === all.getLong(3) + 1, "gap in ids: offsets skipped")
  }

  test("foreachBatch idempotent sink: a replayed batch overwrites, never duplicates") {
    import java.nio.file.{Files, Paths}
    import org.apache.spark.sql.streaming.Trigger
    val ckpt = Files.createTempDirectory("graft-feb-ckpt").toString
    val outDir = Files.createTempDirectory("graft-feb-out").toString + "/out"
    val src = EventStreams.rateEvents(spark, 500).select(col("event_id"))
    def run(trigger: Trigger) =
      EventStreams.runToIdempotentParquet(src, outDir, trigger, ckpt)

    val q1 = run(Trigger.ProcessingTime("250 milliseconds"))
    val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
    def committed() =
      try spark.read.parquet(outDir).count() catch { case _: Exception => 0L }
    while (committed() == 0L && System.nanoTime() < deadline) Thread.sleep(100)
    q1.processAllAvailable(); q1.stop()
    q1.awaitTermination() // release the checkpoint's in-use registration

    // simulate a crash between the sink write and the checkpoint commit:
    // drop the LAST batch's commit marker, so restart must replay that
    // batch into a batch=<id> directory that already has its output. A
    // ProcessingTime stop may also leave a PLANNED next batch (an offsets
    // entry past the last commit) — drop those too, or the offset/commit
    // logs diverge by two batches, which Spark rejects as concurrent
    // checkpoint use rather than a crash to recover from
    def numbered(dir: String) = new java.io.File(s"$ckpt/$dir").listFiles()
      .filter(_.getName.forall(_.isDigit)).sortBy(_.getName.toLong)
    val commits = numbered("commits")
    assert(commits.nonEmpty)
    val replayed = commits.last.getName.toLong
    // the local FS is a ChecksumFileSystem: each log file has a shadow
    // .<name>.crc whose leftover would collide with the re-written log
    def deleteWithCrc(f: java.io.File): Unit = {
      Files.delete(Paths.get(f.getPath))
      val crc = new java.io.File(f.getParentFile, s".${f.getName}.crc")
      if (crc.exists()) Files.delete(crc.toPath)
    }
    deleteWithCrc(commits.last)
    numbered("offsets").filter(_.getName.toLong > replayed).foreach(deleteWithCrc)

    val q2 = run(Trigger.AvailableNow())
    assert(q2.awaitTermination(60000), "AvailableNow run did not self-terminate")
    // the replayed batch's directory exists and the corpus stays exactly
    // 0..max with no duplicate — the overwrite absorbed the replay
    assert(new java.io.File(s"$outDir/batch=$replayed").exists())
    val all = spark.read.parquet(outDir)
      .agg(count(lit(1)), countDistinct(col("event_id")),
        min(col("event_id")), max(col("event_id"))).head
    assert(all.getLong(2) === 0L)
    assert(all.getLong(0) === all.getLong(1), "duplicate ids: replay appended")
    assert(all.getLong(0) === all.getLong(3) + 1, "gap in ids: offsets skipped")
  }

  test("rate source drives the windowed aggregation operators unchanged") {
    import org.apache.spark.sql.streaming.Trigger
    val ckpt = java.nio.file.Files.createTempDirectory("graft-rate-agg").toString
    val agg = EventStreams.tumblingCounts(EventStreams.rateEvents(spark, 500))
    val q = EventStreams.runWithTrigger(agg, "rate_agg", "complete",
      Trigger.ProcessingTime("250 milliseconds"), ckpt)
    try {
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (spark.table("rate_agg").isEmpty && System.nanoTime() < deadline)
        Thread.sleep(100)
      q.processAllAvailable()
      val rows = spark.table("rate_agg").collect()
      assert(rows.nonEmpty, "no aggregated windows in 30s")
      assert(rows.forall(_.getAs[String]("event_type") != null))
    } finally q.stop()
  }

  // processAllAvailable NEVER RETURNS for a ProcessingTimeTimeout query:
  // the engine always owes a future no-data batch (timeouts re-check per
  // batch), so "all available processed" is never a quiescent state.
  // Poll the sink for the expected rows instead — the production-faithful
  // observation anyway.
  private def awaitRows(deadlineMs: Long = 30000)(pred: => Boolean): Unit = {
    val end = System.currentTimeMillis() + deadlineMs
    while (!pred) {
      assert(System.currentTimeMillis() < end, "condition not met in time")
      Thread.sleep(100)
    }
  }

  test("flatMapGroupsWithState keeps running per-user counts across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Long]
    val counts = EventStreams.statefulUserCounts(spark,
      input.toDF().withColumnRenamed("value", "user_id"))
    val q = counts.writeStream.outputMode("append")
      .format("memory").queryName("stateful_out").start()
    def maxCounts = spark.table("stateful_out")
      .groupBy(col("user_id")).agg(max(col("n")).as("n"))
      .as[(Long, Long)].collect().toMap
    try {
      input.addData(1L, 1L, 2L)
      awaitRows()(maxCounts == Map(1L -> 2L, 2L -> 1L))
      input.addData(1L, 2L, 2L)
      awaitRows()(maxCounts == Map(1L -> 3L, 2L -> 3L)) // state carried across batches
    } finally q.stop()
  }

  test("stateful counts evict idle keys after the processing-time timeout") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Long]
    val counts = EventStreams.statefulUserCounts(spark,
      input.toDF().withColumnRenamed("value", "user_id"),
      idleTimeout = "1 second")
    val q = counts.writeStream.outputMode("append")
      .format("memory").queryName("stateful_ttl_out").start()
    def rows = spark.table("stateful_ttl_out")
      .as[(Long, Long)].collect().toSet
    try {
      input.addData(1L, 1L)
      awaitRows()(rows == Set((1L, 2L))) // count = 2, timeout armed
      Thread.sleep(2500)                 // user 1 idles past the 1s timeout
      input.addData(2L)                  // any batch after expiry evicts 1
      awaitRows()(rows == Set((1L, 2L), (2L, 1L)))
      input.addData(1L)                  // user 1 returns — fresh state
      // an UNEVICTED key would emit (1,3); eviction makes it (1,1)
      awaitRows()(rows == Set((1L, 2L), (2L, 1L), (1L, 1L)))
    } finally q.stop()
  }
  test("streaming tool-call verdict counters derive the batch per-tool " +
      "monitor relation at every batch split") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rows = Seq(
      (Option("search"), false, false, true),
      (Option("search"), false, false, false),    // bad args
      (Option("weather"), false, false, true),
      (Option.empty[String], true, false, false), // unparsed malformed
      (Option("frob"), false, true, false),       // unknown tool
      (Option("search"), false, false, true),
      (Option("weather"), false, false, false),
      (Option("search"), true, false, false))     // malformed WITH a name
    val batches = Seq(rows.take(3), rows.slice(3, 6), rows.drop(6))
    val input = MemoryStream[(Option[String], Boolean, Boolean, Boolean)]
    val q = EventStreams.toolVerdictCounts(spark,
        input.toDF().toDF("tool", "malformed_json", "unknown_tool", "ok"))
      .writeStream.outputMode("complete").format("memory")
      .queryName("tool_incr").start()
    try {
      batches.indices.foreach { i =>
        input.addData(batches(i)); q.processAllAvailable()
        val sofar = batches.take(i + 1).flatten
          .toDF("tool", "malformed_json", "unknown_tool", "ok")
        val derived = graft.operators.Behavior.toolCallRatesFromCounts(
          spark.table("tool_incr"))
        val batch = graft.operators.Behavior.toolCallRates(sofar)
        assert(derived.exceptAll(batch).count() === 0 &&
          batch.exceptAll(derived).count() === 0,
          s"streamed counters after batch $i must derive the batch " +
            "monitor relation")
      }
      val fin = graft.operators.Behavior.toolCallRatesFromCounts(
          spark.table("tool_incr"))
        .collect().map(r => r.getString(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
            r.getLong(5), r.getLong(6)))).toMap
      assert(fin("search") === ((4L, 1L, 0L, 1L, 2L, 500000L)),
        "a malformed call that still carried a name counts under its " +
          "tool, and the rate is the half-up ppm")
      assert(fin("<unparsed>") === ((1L, 1L, 0L, 0L, 0L, 0L)))
      assert(fin("frob") === ((1L, 0L, 1L, 0L, 0L, 0L)))
      assert(fin("weather") === ((2L, 0L, 0L, 1L, 1L, 500000L)))
    } finally q.stop()
  }
}
