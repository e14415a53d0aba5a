package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Behavior

class BehaviorSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private def ts(s: String) = Timestamp.valueOf(s)

  private def ev(rows: (Long, String, String)*) = {
    import spark.implicits._
    rows.map { case (u, t, at) => (u, t, ts(at)) }
      .toDF("user_id", "event_type", "ts")
  }

  test("funnel: strict ordering — a same-timestamp next step does not count") {
    val events = ev(
      (1L, "view", "2024-01-01 10:00:00"), (1L, "click", "2024-01-01 10:00:01"),
      (1L, "purchase", "2024-01-01 10:00:02"),
      // u2 clicks at the same instant as the view: not strictly after
      (2L, "view", "2024-01-01 10:00:00"), (2L, "click", "2024-01-01 10:00:00"),
      // u3 clicks BEFORE viewing: ordered funnel rejects it
      (3L, "click", "2024-01-01 09:00:00"), (3L, "view", "2024-01-01 10:00:00"))
    val out = Behavior.funnel(events, Seq("view", "click", "purchase"))
      .orderBy("step").collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    assert(out.toSeq === Seq((1, "view", 3L), (2, "click", 1L), (3, "purchase", 1L)))
  }

  test("funnel: conversion counts from the FIRST completion of the previous step") {
    // u1 views at 10:00 and 12:00; the only click is at 11:00 — after the
    // first view, so it converts even though it precedes the second view
    val events = ev(
      (1L, "view", "2024-01-01 10:00:00"), (1L, "view", "2024-01-01 12:00:00"),
      (1L, "click", "2024-01-01 11:00:00"))
    val out = Behavior.funnel(events, Seq("view", "click"))
      .orderBy("step").collect().map(r => (r.getInt(0), r.getLong(2)))
    assert(out.toSeq === Seq((1, 1L), (2, 1L)))
  }

  test("funnel: unreached tail stages stay present with zero users") {
    val events = ev((1L, "view", "2024-01-01 10:00:00"))
    val out = Behavior.funnel(events, Seq("view", "click", "purchase"))
      .orderBy("step").collect().map(r => (r.getInt(0), r.getLong(2)))
    assert(out.toSeq === Seq((1, 1L), (2, 0L), (3, 0L)))
  }

  test("funnel: conversion deadline — a next step outside the window does not count") {
    val events = ev(
      // u1 clicks 30s after viewing: inside a 60s window
      (1L, "view", "2024-01-01 10:00:00"), (1L, "click", "2024-01-01 10:00:30"),
      // u2 clicks 2min after viewing: outside, even though it's their first
      (2L, "view", "2024-01-01 10:00:00"), (2L, "click", "2024-01-01 10:02:00"))
    val out = Behavior.funnel(events, Seq("view", "click"),
        withinSeconds = Some(60L))
      .orderBy("step").collect().map(r => (r.getInt(0), r.getLong(2)))
    assert(out.toSeq === Seq((1, 2L), (2, 1L)))
    assert(intercept[IllegalArgumentException](
      Behavior.funnel(events, Seq("view"), withinSeconds = Some(0L)))
      .getMessage.contains("positive"))
  }

  test("funnel: duplicate steps fail fast") {
    val events = ev((1L, "view", "2024-01-01 10:00:00"))
    assert(intercept[IllegalArgumentException](
      Behavior.funnel(events, Seq("view", "view"))).getMessage.contains("distinct"))
  }

  test("retention: offset 0 is the cohort size; later weeks count distinct actives") {
    val events = ev(
      // cohort of Mon 2024-01-01: u1 active weeks 0 and 1, u2 week 0 only
      (1L, "view", "2024-01-03 10:00:00"), (1L, "view", "2024-01-10 10:00:00"),
      (1L, "click", "2024-01-10 11:00:00"), // same week: must not double-count
      (2L, "view", "2024-01-04 10:00:00"),
      // cohort of Mon 2024-01-08: u3 active weeks 0 and 2
      (3L, "view", "2024-01-08 10:00:00"), (3L, "view", "2024-01-22 10:00:00"))
    val out = Behavior.retention(events)
      .orderBy("cohort_week", "week_offset").collect()
      .map(r => (r.getDate(0).toString, r.getInt(1), r.getLong(2)))
    assert(out.toSeq === Seq(
      ("2024-01-01", 0, 2L), ("2024-01-01", 1, 1L),
      ("2024-01-08", 0, 1L), ("2024-01-08", 2, 1L)))
  }

  test("sessionize: a gap of exactly gapSeconds breaks; ids count per user in time order") {
    import spark.implicits._
    val events = Seq(
      (10L, 1L, ts("2024-01-01 10:00:00")),
      (11L, 1L, ts("2024-01-01 10:29:59")), // 29:59 gap — same session
      (12L, 1L, ts("2024-01-01 10:59:59")), // exactly 30:00 gap — breaks
      (13L, 2L, ts("2024-01-01 09:00:00"))
    ).toDF("event_id", "user_id", "ts")
    val out = Behavior.sessionize(events)
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(out === Map(10L -> "1#1", 11L -> "1#1", 12L -> "1#2", 13L -> "2#1"))
    assert(intercept[IllegalArgumentException](
      Behavior.sessionize(events, gapSeconds = 0))
      .getMessage.contains("positive"))
  }

  test("sessionize boundaries agree with the session-window aggregate") {
    // the >= break rule must match EventStreams.sessionCounts: sessions
    // per user derived from the tag equal the aggregate's session count
    val events = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
    val fromTag = Behavior.sessionize(events)
      .select(col("user_id"), col("session_id")).distinct()
      .groupBy("user_id").count()
    val fromAgg = graft.streaming.EventStreams.sessionCounts(events)
      .groupBy("user_id").count()
    assert(fromTag.exceptAll(fromAgg).isEmpty && fromAgg.exceptAll(fromTag).isEmpty,
      "per-user session counts diverge between the tag and the aggregate")
  }

  test("funnel and retention shuffle only by user key — no window over raw events") {
    val events = ev((1L, "view", "2024-01-01 10:00:00"))
    for (p <- Seq(
        Behavior.funnel(events, Seq("view", "click")).queryExecution.executedPlan.toString,
        Behavior.retention(events).queryExecution.executedPlan.toString)) {
      assert(!p.contains("Window"), s"unexpected window:\n$p")
      assert(!p.contains("CartesianProduct"), s"unexpected cartesian:\n$p")
    }
  }

  test("last-touch attribution: latest in-window touch wins, same-ts " +
      "ties resolve to max channel, out-of-window and no-touch stay " +
      "organic (null)") {
    import spark.implicits._
    val events = Seq(
      (1L, 10L, "click", "2026-01-01 10:00:00", 0.0),
      (2L, 10L, "view", "2026-01-03 09:00:00", 0.0),
      // latest of the two touches wins
      (3L, 10L, "purchase", "2026-01-03 12:00:00", 50.0),
      (4L, 20L, "click", "2026-01-01 08:00:00", 0.0),
      // touch is 8 days + 1 s before the conversion: outside the 7-day
      // lookback -> organic
      (5L, 20L, "purchase", "2026-01-09 08:00:01", 70.0),
      (6L, 30L, "purchase", "2026-01-05 10:00:00", 30.0), // never touched
      (7L, 40L, "click", "2026-01-02 10:00:00", 0.0),
      (8L, 40L, "view", "2026-01-02 10:00:00", 0.0), // same-ts tie
      // touch exactly AT the conversion ts matches (at-or-before)
      (9L, 40L, "purchase", "2026-01-02 10:00:00", 10.0)
    ).map { case (e, u, t, at, v) => (e, u, t, ts(at), v) }
      .toDF("event_id", "user_id", "event_type", "ts", "value")
    val out = Behavior.lastTouch(events, "purchase",
        Seq("click", "view"), 7L * 86400L * 1000000L)
      .collect().map(r => r.getLong(0) ->
        ((Option(r.getAs[String]("channel")),
          Option(r.getAs[Timestamp]("touch_ts"))))).toMap
    assert(out.keySet === Set(3L, 5L, 6L, 9L),
      "every conversion comes back, nothing else")
    assert(out(3L) === ((Some("view"), Some(ts("2026-01-03 09:00:00")))))
    assert(out(5L) === ((None, None)), "outside the lookback -> organic")
    assert(out(6L) === ((None, None)), "never-touched user -> organic")
    assert(out(9L) === ((Some("view"), Some(ts("2026-01-02 10:00:00")))),
      "same-ts tie pre-reduces to the max channel, deterministically")
    intercept[IllegalArgumentException](
      Behavior.lastTouch(events, "purchase", Seq.empty, 1L))
    intercept[IllegalArgumentException](
      Behavior.lastTouch(events, "purchase", Seq("purchase"), 1L))
    intercept[IllegalArgumentException](
      Behavior.lastTouch(events, "purchase", Seq("click"), 0L))
  }

  test("linear attribution: equal credit per touch with integral-micro " +
      "division, organic keeps the full credit on a null channel") {
    import spark.implicits._
    val events = Seq(
      (1L, 10L, "click", "2026-01-01 10:00:00", 0.0),
      (2L, 10L, "click", "2026-01-02 10:00:00", 0.0),
      (3L, 10L, "view", "2026-01-03 10:00:00", 0.0),
      (4L, 10L, "purchase", "2026-01-03 12:00:00", 60.0), // 3 touches in window
      (5L, 20L, "click", "2026-01-01 08:00:00", 0.0),
      (6L, 20L, "purchase", "2026-01-09 09:00:00", 70.0), // touch out of window
      (7L, 30L, "purchase", "2026-01-05 10:00:00", 30.0)  // never touched
    ).map { case (e, u, t, at, v) => (e, u, t, ts(at), v) }
      .toDF("event_id", "user_id", "event_type", "ts", "value")
    val out = Behavior.linearAttribution(events, "purchase",
        Seq("click", "view"), 7L * 86400L * 1000000L)
      .collect()
      .map(r => (r.getLong(0), Option(r.getString(3))) -> r.getLong(4))
      .toMap
    // 2 clicks of 3 touches: 2e6 div 3; 1 view: 1e6 div 3 (floor, the
    // remainder dropped — deterministic over cosmetically exact)
    assert(out === Map(
      (4L, Some("click")) -> 666666L, (4L, Some("view")) -> 333333L,
      (6L, None) -> 1000000L, (7L, None) -> 1000000L))
    intercept[IllegalArgumentException](
      Behavior.linearAttribution(events, "purchase", Seq.empty, 1L))
  }

  test("multi-touch guard: a user over the touch cap fails loudly with " +
      "the user named; within the cap the result is unchanged") {
    import spark.implicits._
    val events = Seq(
      (1L, 10L, "click", "2026-01-01 10:00:00", 0.0),
      (2L, 10L, "click", "2026-01-02 10:00:00", 0.0),
      (3L, 10L, "view", "2026-01-03 10:00:00", 0.0),
      (4L, 10L, "purchase", "2026-01-03 12:00:00", 60.0)
    ).map { case (e, u, t, at, v) => (e, u, t, ts(at), v) }
      .toDF("event_id", "user_id", "event_type", "ts", "value")
    val ex = intercept[Exception] {
      Behavior.linearAttribution(events, "purchase", Seq("click", "view"),
        7L * 86400L * 1000000L, maxTouchesPerUser = 2).collect()
    }
    assert(ex.getMessage.contains("user 10") &&
      ex.getMessage.contains("cap 2"), s"got: ${ex.getMessage}")
    // exactly at the cap: no refusal; 40/20/40 over (click, click, view)
    // = first click 400000 + middle click 200000, last view 400000
    val ok = Behavior.positionAttribution(events, "purchase",
        Seq("click", "view"), 7L * 86400L * 1000000L,
        maxTouchesPerUser = 3)
      .collect().map(r => Option(r.getString(3)) -> r.getLong(4)).toMap
    assert(ok === Map(Some("click") -> 600000L, Some("view") -> 400000L))
  }

  test("time-decay attribution: weights halve per whole half-life, " +
      "credit splits by integral weight shares, organic keeps 1e6") {
    import spark.implicits._
    val events = Seq(
      // user 10: click 2.5 days before (k=2, w=250000), view 0.5 days
      // before (k=0, w=1000000); total 1250000
      (1L, 10L, "click", "2026-01-01 00:00:00", 0.0),
      (2L, 10L, "view", "2026-01-03 00:00:00", 0.0),
      (3L, 10L, "purchase", "2026-01-03 12:00:00", 60.0),
      // user 20: organic
      (4L, 20L, "purchase", "2026-01-05 10:00:00", 10.0)
    ).map { case (e, u, t, at, v) => (e, u, t, ts(at), v) }
      .toDF("event_id", "user_id", "event_type", "ts", "value")
    val out = Behavior.timeDecayAttribution(events, "purchase",
        Seq("click", "view"), 7L * 86400L * 1000000L, 86400L * 1000000L)
      .collect()
      .map(r => (r.getLong(0), Option(r.getString(3))) -> r.getLong(4))
      .toMap
    // click: 250000*1e6 div 1250000 = 200000; view: 1000000*1e6 div
    // 1250000 = 800000
    assert(out === Map(
      (3L, Some("click")) -> 200000L, (3L, Some("view")) -> 800000L,
      (4L, None) -> 1000000L))
    // beyond 62 half-lives the shift would underflow — loud refusal
    intercept[IllegalArgumentException](
      Behavior.timeDecayAttribution(events, "purchase", Seq("click"),
        lookbackMicros = 100L * 86400L * 1000000L, halfLifeMicros = 1000L))
  }

  test("dialog audit: alternation violations, role verdicts, null roles " +
      "are alien, ordering ties break by id") {
    import spark.implicits._
    val rows = Seq(
      // conv 1: perfect u/a/u/a dialog
      (1L, 1L, "2026-01-01 10:00:00", "user"),
      (1L, 2L, "2026-01-01 10:01:00", "assistant"),
      (1L, 3L, "2026-01-01 10:02:00", "user"),
      (1L, 4L, "2026-01-01 10:03:00", "assistant"),
      // conv 2: double-user violation + trailing user
      (2L, 5L, "2026-01-01 10:00:00", "user"),
      (2L, 6L, "2026-01-01 10:01:00", "user"),
      (2L, 7L, "2026-01-01 10:02:00", "assistant"),
      (2L, 8L, "2026-01-01 10:03:00", "user"),
      // conv 3: assistant-first, same-ts tie ordered by id (9 before 10),
      // a null role (alien), a 'system' role (alien)
      (3L, 9L, "2026-01-01 10:00:00", "assistant"),
      (3L, 10L, "2026-01-01 10:00:00", "user"),
      (3L, 11L, "2026-01-01 10:01:00", null.asInstanceOf[String]),
      (3L, 12L, "2026-01-01 10:02:00", "system"),
      // conv 4: a perfect u/a alternation whose ONLY defect is one
      // unplaceable (null-ts) turn — must still fail the verdict
      (4L, 13L, "2026-01-01 10:00:00", "user"),
      (4L, 14L, "2026-01-01 10:01:00", "assistant"),
      (4L, 15L, null.asInstanceOf[String], "user"),
      // conv 5: EVERY turn null-ts — still surfaces, malformed
      (5L, 16L, null.asInstanceOf[String], "user")
    ).map { case (c, e, at, r) =>
      (c, e, if (at == null) null else java.sql.Timestamp.valueOf(at), r) }
      .toDF("conv", "event_id", "ts", "role")
    val out = Behavior.dialogAudit(rows, "conv", "ts", "event_id", "role")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getString(2), r.getString(3), r.getLong(4),
          r.getLong(5), r.getLong(6), r.getBoolean(7)))).toMap
    assert(out(1L) === ((4L, "user", "assistant", 0L, 0L, 0L, true)))
    assert(out(2L) === ((4L, "user", "user", 1L, 0L, 0L, false)),
      "one double-user violation; trailing user breaks the verdict")
    assert(out(3L) === ((4L, "assistant", "system", 0L, 2L, 0L, false)),
      "tie orders by id (assistant first), null + system are alien")
    assert(out(4L) === ((2L, "user", "assistant", 0L, 0L, 1L, false)),
      "a conversation whose only violation is a null-ts turn must NOT " +
        "audit well_formed — the dropped turn is counted, not hidden")
    assert(out(5L) === ((0L, null, null, 0L, 0L, 1L, false)),
      "an all-null-ts conversation still surfaces as malformed")
  }

  test("sft pairs: one example per assistant turn with the prior-turns " +
      "context, ties by id, null role/text render empty, null ts raises") {
    import spark.implicits._
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val rows = Seq(
      (1L, 1L, t("2026-01-01 10:00:00"), "user", "hi"),
      (1L, 2L, t("2026-01-01 10:01:00"), "assistant", "hello"),
      (1L, 3L, t("2026-01-01 10:02:00"), "user", "thanks"),
      (1L, 4L, t("2026-01-01 10:03:00"), "assistant", "bye"),
      // conv 2: assistant-first (empty context) + same-ts tie by id +
      // a null-role and a null-text turn rendering as empty strings
      (2L, 5L, t("2026-01-01 09:00:00"), "assistant", "opener"),
      (2L, 6L, t("2026-01-01 09:01:00"), null.asInstanceOf[String], "x"),
      (2L, 7L, t("2026-01-01 09:02:00"), "user", null.asInstanceOf[String]),
      (2L, 8L, t("2026-01-01 09:02:00"), "assistant", "end")
    ).toDF("conv", "event_id", "ts", "role", "txt")
    val out = Behavior.sftPairs(rows, "conv", "ts", "event_id", "role",
        "txt")
      .collect().map(r => r.getLong(1) ->
        ((r.getLong(2), r.getString(3), r.getString(4)))).toMap
    assert(out.keySet === Set(2L, 4L, 5L, 8L),
      "exactly one pair per assistant turn")
    assert(out(2L) === ((1L, "user: hi", "hello")))
    assert(out(4L) === ((3L, "user: hi\nassistant: hello\nuser: thanks",
      "bye")), "the context carries every prior turn in order")
    assert(out(5L) === ((0L, "", "opener")),
      "an assistant-first turn gets an empty context, not a dropped row")
    // the same-ts tie (7 before 8 by id) and the null renders
    assert(out(8L) === ((3L, "assistant: opener\n: x\nuser: ", "end")))
    // an unplaceable (null-ts) turn fails the job loudly
    val bad = rows.union(Seq((3L, 9L, null.asInstanceOf[java.sql.Timestamp],
      "user", "lost")).toDF("conv", "event_id", "ts", "role", "txt"))
    val ex = intercept[Exception](
      Behavior.sftPairs(bad, "conv", "ts", "event_id", "role", "txt")
        .collect())
    assert(ex.getMessage.contains("unplaceable"),
      "null-ts turns must refuse, not silently drop (run dialogAudit first)")
  }

  test("chat template: turns wrap and order by (ts, id), nulls render " +
      "empty, an unplaceable turn raises") {
    import spark.implicits._
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val rows = Seq(
      (1L, 2L, t("2026-01-01 10:01:00"), "assistant", "hello"),
      (1L, 1L, t("2026-01-01 10:00:00"), "user", "hi"),
      // same-ts tie orders by id; null role/text render empty
      (2L, 3L, t("2026-01-01 09:00:00"), null.asInstanceOf[String], "x"),
      (2L, 4L, t("2026-01-01 09:00:00"), "user", null.asInstanceOf[String])
    ).toDF("conv", "event_id", "ts", "role", "txt")
    val out = Behavior.renderChatTemplate(rows, "conv", "ts", "event_id",
        "role", "txt")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2))))
      .toMap
    assert(out(1L) === ((2L,
      "<|im_start|>user\nhi<|im_end|>\n<|im_start|>assistant\nhello<|im_end|>")),
      "turns must order by event time, not arrival order")
    assert(out(2L) === ((2L,
      "<|im_start|>\nx<|im_end|>\n<|im_start|>user\n<|im_end|>")))
    val ex = intercept[Exception](Behavior.renderChatTemplate(
      rows.union(Seq((3L, 9L, null.asInstanceOf[java.sql.Timestamp],
        "user", "lost")).toDF("conv", "event_id", "ts", "role", "txt")),
      "conv", "ts", "event_id", "role", "txt").collect())
    assert(ex.getMessage.contains("unplaceable"))
  }

  test("time-decay attribution: all-ancient touches clamp to 1 micro " +
      "each — the conversion credits instead of emitting NULL rows") {
    import spark.implicits._
    // hourly half-life with a 2-day lookback = 48 half-lives (shift
    // valid); the division underflows to 0 at k>=20, so both touches
    // (k=36, k=30) land in the clamp regime
    val events = Seq(
      (1L, 10L, "click", "2026-01-01 00:00:00", 0.0), // 36h = k 36
      (2L, 10L, "view", "2026-01-01 06:00:00", 0.0),  // 30h = k 30
      (3L, 10L, "purchase", "2026-01-02 12:00:00", 60.0)
    ).map { case (e, u, t, at, v) => (e, u, t, ts(at), v) }
      .toDF("event_id", "user_id", "event_type", "ts", "value")
    val out = Behavior.timeDecayAttribution(events, "purchase",
        Seq("click", "view"), lookbackMicros = 2L * 86400L * 1000000L,
        halfLifeMicros = 3600L * 1000000L)
      .collect()
      .map(r => Option(r.getString(3)) -> r.getLong(4)).toMap
    // each touch weight clamps to 1; credit = 1*1e6 div 2 = 500000 each —
    // no NULL credit, no vanished conversion
    assert(out === Map(Some("click") -> 500000L, Some("view") -> 500000L))
  }

  test("position attribution: 40/20/40 with integral middle shares, " +
      "1-touch and 2-touch conventions, organic on a null channel") {
    import spark.implicits._
    val events = Seq(
      // user 10: 4 touches -> first click 40, view+click middles 10+10, last view 40
      (1L, 10L, "click", "2026-01-01 10:00:00", 0.0),
      (2L, 10L, "view", "2026-01-02 10:00:00", 0.0),
      (3L, 10L, "click", "2026-01-02 11:00:00", 0.0),
      (4L, 10L, "view", "2026-01-03 10:00:00", 0.0),
      (5L, 10L, "purchase", "2026-01-03 12:00:00", 60.0),
      // user 20: exactly two touches -> 50/50
      (6L, 20L, "click", "2026-01-01 08:00:00", 0.0),
      (7L, 20L, "view", "2026-01-02 08:00:00", 0.0),
      (8L, 20L, "purchase", "2026-01-03 09:00:00", 70.0),
      // user 30: single touch takes all
      (9L, 30L, "view", "2026-01-05 09:00:00", 0.0),
      (10L, 30L, "purchase", "2026-01-05 10:00:00", 30.0),
      // user 40: organic
      (11L, 40L, "purchase", "2026-01-05 10:00:00", 10.0),
      // user 50: 5 touches, middle share 200000 div 3 = 66666 each
      (12L, 50L, "click", "2026-01-01 01:00:00", 0.0),
      (13L, 50L, "view", "2026-01-01 02:00:00", 0.0),
      (14L, 50L, "view", "2026-01-01 03:00:00", 0.0),
      (15L, 50L, "view", "2026-01-01 04:00:00", 0.0),
      (16L, 50L, "click", "2026-01-01 05:00:00", 0.0),
      (17L, 50L, "purchase", "2026-01-01 06:00:00", 5.0)
    ).map { case (e, u, t, at, v) => (e, u, t, ts(at), v) }
      .toDF("event_id", "user_id", "event_type", "ts", "value")
    val out = Behavior.positionAttribution(events, "purchase",
        Seq("click", "view"), 7L * 86400L * 1000000L)
      .collect()
      .map(r => (r.getLong(0), Option(r.getString(3))) -> r.getLong(4))
      .toMap
    assert(out === Map(
      // user 10: click first (400000) + click middle (100000); view middle
      // (100000) + view last (400000)
      (5L, Some("click")) -> 500000L, (5L, Some("view")) -> 500000L,
      (8L, Some("click")) -> 500000L, (8L, Some("view")) -> 500000L,
      (10L, Some("view")) -> 1000000L,
      (11L, None) -> 1000000L,
      // user 50: click first 400000 + click last 400000; 3 view middles
      // at 200000 div 3 = 66666 each
      (17L, Some("click")) -> 800000L, (17L, Some("view")) -> 199998L))
  }

  test("markov transitions: exact counts, half-up micros, tie-broken order") {
    import spark.implicits._
    // user 1: a -> b -> a -> b   (a->b twice, b->a once)
    // user 2: a -> a             (a->a once; same-ts pair ordered by id)
    val ev = Seq(
      (1L, 1L, 10L, "a"), (2L, 1L, 20L, "b"), (3L, 1L, 30L, "a"),
      (4L, 1L, 40L, "b"),
      (5L, 2L, 10L, "a"), (6L, 2L, 10L, "a"))
      .toDF("event_id", "user_id", "ts", "event_type")
    val out = graft.operators.Behavior.markovTransitions(
        ev, "user_id", "event_type", "ts", "event_id")
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getLong(3))))
      .toMap
    // from 'a': 3 transitions total — a->b 2 (666667 half-up), a->a 1 (333333)
    assert(out(("a", "b")) === ((2L, 666667L)))
    assert(out(("a", "a")) === ((1L, 333333L)))
    assert(out(("b", "a")) === ((1L, 1000000L)))
    assert(out.size === 3)
    // per-from micros sum to 1e6 within integer truncation slack (< |row|)
    val perFrom = out.toSeq.groupBy(_._1._1)
      .map { case (f, xs) => f -> xs.map(_._2._2).sum }
    assert(perFrom.forall { case (_, s) => s >= 999998L && s <= 1000001L })
  }

  test("dialogPaths: one conversation per leaf with every ancestor in " +
      "order, a shared prefix fans out, orphans/cycles/too-deep trees " +
      "raise instead of silently truncating") {
    import spark.implicits._
    // root 1 -> {2, 3}; 2 -> 4; 3 -> {5, 6}: leaves 4, 5, 6
    val msgs = Seq(
      (1L, Option.empty[Long], "system", "be helpful"),
      (2L, Option(1L), "user", "hi"),
      (3L, Option(1L), "user", "hello"),
      (4L, Option(2L), "assistant", "hi there"),
      (5L, Option(3L), "assistant", "hello back"),
      (6L, Option(3L), "assistant", "greetings"))
      .toDF("msg_id", "parent_id", "role", "text")
    val out = Behavior.dialogPaths(msgs, "msg_id", "parent_id",
        "role", "text")
      .collect().map(r => (r.getLong(0), r.getLong(2)) ->
        ((r.getLong(1), r.getLong(3), r.getString(4), r.getString(5))))
      .toMap
    assert(out.size === 9, "3 leaves x 3 turns")
    assert(out((4L, 1L)) === ((3L, 1L, "system", "be helpful")))
    assert(out((4L, 2L)) === ((3L, 2L, "user", "hi")))
    assert(out((4L, 3L)) === ((3L, 4L, "assistant", "hi there")))
    assert(out((5L, 2L))._2 === 3L && out((6L, 2L))._2 === 3L,
      "the shared prefix fans out into both sibling paths")
    // an orphan (parent id absent from the relation) raises
    val orphan = msgs.unionByName(
      Seq((9L, Option(99L), "user", "lost")).toDF(
        "msg_id", "parent_id", "role", "text"))
    val ex1 = intercept[Exception](Behavior.dialogPaths(orphan,
      "msg_id", "parent_id", "role", "text").collect())
    assert(ex1.getMessage.contains("unreachable"))
    // a cycle raises (neither member is ever reached from a root)
    val cyc = msgs.unionByName(Seq(
      (7L, Option(8L), "user", "a"), (8L, Option(7L), "user", "b"))
      .toDF("msg_id", "parent_id", "role", "text"))
    val ex2 = intercept[Exception](Behavior.dialogPaths(cyc,
      "msg_id", "parent_id", "role", "text").collect())
    assert(ex2.getMessage.contains("unreachable"))
    // a tree deeper than maxDepth raises rather than truncating
    val ex3 = intercept[Exception](Behavior.dialogPaths(msgs,
      "msg_id", "parent_id", "role", "text", maxDepth = 2).collect())
    assert(ex3.getMessage.contains("within 2 levels"))
  }

  test("dialogPaths: the empty-frontier early exit returns exactly the " +
      "fixed-rounds output, and a non-integral id raises the id-type " +
      "error instead of the misleading unreachable raise") {
    import spark.implicits._
    // depth-3 forest: maxDepth 32 must early-exit after round 4's empty
    // frontier and produce the identical relation maxDepth 3 does
    val msgs = Seq(
      (1L, Option.empty[Long], "system", "be helpful"),
      (2L, Option(1L), "user", "hi"),
      (4L, Option(2L), "assistant", "hi there"),
      (10L, Option.empty[Long], "user", "solo root"))
      .toDF("msg_id", "parent_id", "role", "text")
    val wide = Behavior.dialogPaths(msgs, "msg_id", "parent_id", "role",
      "text", maxDepth = 32)
    val tight = Behavior.dialogPaths(msgs, "msg_id", "parent_id", "role",
      "text", maxDepth = 3)
    assert(wide.exceptAll(tight).count() === 0 &&
      tight.exceptAll(wide).count() === 0,
      "early exit == fixed rounds, row for row")
    assert(wide.count() === 4L, "2 leaves, paths of 3 and 1 turns")
    // a UUID-style id trips the explicit integral-id contract
    val uuid = Seq(("550e8400-e29b", Option.empty[String], "user", "x"))
      .toDF("msg_id", "parent_id", "role", "text")
    val ex = intercept[Exception](Behavior.dialogPaths(uuid, "msg_id",
      "parent_id", "role", "text").collect())
    assert(ex.getMessage.contains("does not cast to long"))
  }

  test("toolCallAudit: per-call verdicts — malformed JSON surfaces " +
      "(never drops), unknown tools, missing required args, type " +
      "mismatches incl. a JSON null and nested object/array classes, " +
      "extra args, and the schema-relation guards raise") {
    import spark.implicits._
    val schema = Seq(
      ("search", "q", "string", true), ("search", "limit", "number", false),
      ("weather", "city", "string", true), ("weather", "days", "number", true),
      ("weather", "metric", "boolean", false),
      ("deploy", "cfg", "object", true), ("deploy", "tags", "array", false))
      .toDF("tool", "arg", "arg_type", "required")
    val calls = Seq(
      (1L, """{"name":"search","arguments":{"q":"cats","limit":5}}"""),
      (2L, """{"name":"search","arguments":{"q":7}}"""),          // q number
      (3L, """{"name":"weather","arguments":{"city":"SF"}}"""),   // days missing
      (4L, """{"name":"weather","arguments":{"city":"SF","days":null}}"""), // null
      (5L, """{"name":"frobnicate","arguments":{"x":1}}"""),      // unknown
      (6L, """{"name":"search","arguments":{"q":"a","verbose":true}}"""), // extra
      (7L, """{"name":"search"""),                                 // malformed
      (8L, """{"arguments":{"q":"a"}}"""),                         // no name
      (9L, """{"name":"deploy","arguments":{"cfg":{"e":"prod"},"tags":["a"]}}"""),
      (10L, """{"name":"deploy","arguments":{"cfg":"prod"}}"""),   // obj mismatch
      (11L, """{"name":"search","arguments":"notobj"}"""))         // args not object
      .toDF("call_id", "call_json")
    val out = Behavior.toolCallAudit(calls, "call_id", "call_json", schema)
      .collect().map(r => r.getLong(0) ->
        ((r.getBoolean(2), r.getBoolean(3), r.getLong(4), r.getLong(5),
          r.getString(6), r.getLong(7), r.getString(8), r.getLong(9),
          r.getString(10), r.getBoolean(11)))).toMap
    assert(out.size === 11, "every call gets exactly one verdict row")
    assert(out(1L) === ((false, false, 2L, 0L, "", 0L, "", 0L, "", true)))
    assert(out(2L) === ((false, false, 1L, 0L, "", 1L, "q", 0L, "", false)))
    assert(out(3L) === ((false, false, 1L, 1L, "days", 0L, "", 0L, "", false)))
    assert(out(4L) === ((false, false, 2L, 0L, "", 1L, "days", 0L, "", false)),
      "a JSON null value is provided-but-null: class mismatch, not missing")
    assert(out(5L) === ((false, true, 1L, 0L, "", 0L, "", 0L, "", false)),
      "unknown tool: args counted but not judged against a non-schema")
    assert(out(6L) === ((false, false, 2L, 0L, "", 0L, "", 1L, "verbose", false)))
    assert(out(7L)._1 === true && out(7L)._10 === false, "unparseable JSON")
    assert(out(8L)._1 === true, "a call without a name is malformed")
    assert(out(9L) === ((false, false, 2L, 0L, "", 0L, "", 0L, "", true)),
      "nested object and array classes validate against their decls")
    assert(out(10L) === ((false, false, 1L, 0L, "", 1L, "cfg", 0L, "", false)))
    assert(out(11L)._1 === true, "non-object arguments is malformed")
    // schema guards: alien declared type, duplicate declaration
    val alien = schema.unionByName(
      Seq(("search", "flag", "bool", false))
        .toDF("tool", "arg", "arg_type", "required"))
    val ex1 = intercept[Exception](Behavior.toolCallAudit(calls,
      "call_id", "call_json", alien).collect())
    assert(ex1.getMessage.contains("outside"))
    val dup = schema.unionByName(
      Seq(("search", "q", "string", false))
        .toDF("tool", "arg", "arg_type", "required"))
    val ex2 = intercept[Exception](Behavior.toolCallAudit(calls,
      "call_id", "call_json", dup).collect())
    assert(ex2.getMessage.contains("declared 2 times"))
  }

  test("siblingPreferences: best child wins with ties to the lower id, " +
      "tied siblings surface with tie=true rather than vanish, " +
      "single-child parents emit nothing, unjudged rows drop, the " +
      "Long.MinValue negation guard raises") {
    import spark.implicits._
    val msgs = Seq(
      (2L, Option(1L), Option(100L)), (3L, Option(1L), Option(300L)),
      (4L, Option(1L), Option(300L)),           // tie with 3 -> 3 wins
      (6L, Option(5L), Option(50L)),            // single child
      (7L, Option(1L), Option.empty[Long]),     // unjudged sibling
      (1L, Option.empty[Long], Option(999L)))   // root: no parent
      .toDF("msg_id", "parent_id", "score")
    val out = Behavior.siblingPreferences(msgs, "msg_id", "parent_id",
        "score")
      .collect().map(r => r.getLong(3) ->
        ((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(4),
          r.getLong(5), r.getBoolean(6)))).toMap
    assert(out.size === 2, "parent 1 yields two rejected rows; the " +
      "single-child parent and the root emit nothing")
    assert(out(2L) === ((1L, 3L, 300L, 100L, 200L, false)))
    assert(out(4L) === ((1L, 3L, 300L, 300L, 0L, true)),
      "the equal-score sibling surfaces as a tie, margin 0")
    val huge = Seq((2L, Option(1L), Option(Long.MinValue)),
      (3L, Option(1L), Option(5L))).toDF("msg_id", "parent_id", "score")
    val ex = intercept[Exception](Behavior.siblingPreferences(huge,
      "msg_id", "parent_id", "score").collect())
    assert(ex.getMessage.contains("Long.MinValue"))
  }
}
