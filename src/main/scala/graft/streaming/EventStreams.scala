package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{
  GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** Structured-Streaming operators over the `events` stream: windowed and
  * sessionized aggregation with watermarks, within-watermark dedup, and a
  * custom-state example via flatMapGroupsWithState.
  *
  * Each aggregation has a batch-equivalent query in
  * [[graft.queries.EventQueries]] (same column expressions) so the
  * semantics are DuckDB-oracle-checked in batch while these entry points
  * provide the incremental/stateful execution path. At scale the state
  * store partitions by the grouping key; watermarks bound state size.
  */
object EventStreams {

  /** Raw file schema with `ts` left abstract: the driver has generated
    * both TIMESTAMP(NANOS) (→ long under the legacy flag) and plain
    * TIMESTAMP(MICROS) (→ TIMESTAMP_NTZ) across rounds — see
    * [[graft.sources.Tables.normalizeTs]]. */
  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** File-source stream over a parquet path (explicit schema — streaming
    * sources must never infer). The `ts` physical type is taken from a
    * one-off batch footer read of the same path (runs no job), then
    * normalized to session-zone TimestampType exactly as the batch
    * loader does, so batch/stream parity specs compare like for like.
    * An empty or not-yet-created directory is a NORMAL startup state for
    * a file-source stream (the producer may land files after the query
    * starts), so a failed probe falls back to the LongType default of
    * [[eventSchema]] instead of propagating "unable to infer schema"
    * (EventStreamsSpec pins the empty-dir start). */
  def readEvents(spark: SparkSession, path: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val tsType =
      try spark.read.parquet(path).schema("ts").dataType
      catch { case _: org.apache.spark.sql.AnalysisException =>
        eventSchema("ts").dataType }
    val schema = StructType(eventSchema.map(f =>
      if (f.name == "ts") f.copy(dataType = tsType) else f))
    graft.sources.Tables.normalizeTs(
      spark.readStream.schema(schema).parquet(path))
  }

  /** Tumbling 1-hour counts/sums per event type. */
  def tumblingCounts(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double").as("sum_value"))
      .select(col("window.start").as("win_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** Sliding 10-minute windows every 5 minutes. */
  def slidingCounts(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "600 seconds", "300 seconds"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("win_start"), col("n"))

  /** Stream-static dimension enrichment — the canonical "fact stream ×
    * dimension table" shape: the static side joins as a broadcast against
    * every micro-batch. The dimension SNAPSHOTS at query start — its
    * file listing rides the captured plan, so an in-place parquet
    * overwrite under a running query fails the next batch (stale index;
    * observed with and without refreshByPath). Rolling a new dimension
    * = restart the query with a re-read dim (spec-pinned; checkpointed
    * sinks make restarts exactly-once — see [[runToIdempotentParquet]]),
    * or keep the dim in a snapshot-refreshing table format. The enriched
    * stream then aggregates per tumbling window and
    * dimension attribute. Stream-static inner joins are append-safe: no
    * state store involvement on the static side, so the only state is
    * the windowed aggregation's, bounded by the watermark. Works
    * identically over a batch frame (withWatermark is a no-op there) —
    * q_e7's DuckDB oracle pins the semantics the stream executes
    * incrementally.
    *
    * `dim` must carry `(user_id, segment)` — pre-project with
    * [[segmentDim]] for the customer table. */
  def enrichedSegmentCounts(events: DataFrame, dim: DataFrame,
      watermark: String = "1 hour"): DataFrame =
    events.withWatermark("ts", watermark)
      .join(broadcast(dim), Seq("user_id"))
      .groupBy(window(col("ts"), "1 hour"), col("segment"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double").as("sum_value"))
      .select(col("window.start").as("win_start"), col("segment"),
        col("n"), col("sum_value"))

  /** The customer table as the `(user_id, segment)` dimension
    * [[enrichedSegmentCounts]] joins (event user ids are customer keys). */
  def segmentDim(customer: DataFrame): DataFrame =
    customer.select(col("c_custkey").cast("long").as("user_id"),
      col("c_mktsegment").as("segment"))

  /** Streaming anomaly flagging against a SNAPSHOT moments dimension —
    * the production monitoring shape: per-key moments are trained on
    * HISTORY (a batch [[graft.operators.Anomaly.moments]] pass, e.g.
    * nightly), and the live stream scores each event against them with
    * one broadcast join + map-side arithmetic — stateless, so it runs
    * identically over a stream or a batch frame, and the same
    * dim-snapshot/restart contract as [[enrichedSegmentCounts]] applies
    * to rolling in refreshed moments. Cold-start keys (no history row)
    * come through with z = null, flagged false — events are never
    * dropped by monitoring. Left stream-static joins are append-safe:
    * no state store, no watermark needed. */
  def anomalyFlags(events: DataFrame, moments: DataFrame,
      threshold: Double = 2.0): DataFrame =
    graft.operators.Anomaly.scoreAgainstMoments(
      events.select(col("event_id"), col("user_id"), col("value")),
      moments, "user_id", "value", threshold)

  /** Session windows with a 30-minute inactivity gap, per user. */
  def sessionCounts(events: DataFrame, gap: String = "30 minutes",
      watermark: String = "1 hour"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"), col("n_events"))

  /** Exactly-once-per-id dedup with bounded state. */
  def dedupEvents(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(Seq("event_id"))

  /** Watermarked stream-stream interval join: each click joins the errors
    * of the same user from the preceding `horizon`. Both sides carry
    * watermarks and the join condition time-bounds the match, so the state
    * store can evict rows once the watermark passes — bounded state, the
    * only stream-stream join shape that survives unbounded input.
    */
  def clickErrorJoin(events: DataFrame, horizon: String = "10 minutes",
      watermark: String = "1 hour"): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"),
        col("ts").as("click_ts"))
      .withWatermark("click_ts", watermark)
    val errors = events.filter(col("event_type") === "error")
      .select(col("user_id").as("err_user"), col("ts").as("err_ts"))
      .withWatermark("err_ts", watermark)
    clicks.join(errors,
      col("user_id") === col("err_user") &&
        col("err_ts") <= col("click_ts") &&
        col("err_ts") >= col("click_ts") - expr(s"INTERVAL $horizon"))
      .select(col("click_id"), col("user_id"), col("click_ts"), col("err_ts"))
  }

  final case class UserCount(user_id: Long, n: Long)

  /** Custom keyed state via flatMapGroupsWithState: running per-user event
    * count emitted on every update.
    *
    * State is BOUNDED by an idle timeout (every other stateful op here is
    * watermark-bounded; unbounded per-key state is the one shape that
    * cannot survive an unbounded key space): a key idle for more than
    * `idleTimeout` of processing time has its state evicted on the next
    * micro-batch, and a later event for that user restarts its count from
    * zero — the state-size/continuity trade a production running-count
    * makes explicit. Timeouts fire only when a batch runs (Spark checks
    * them per micro-batch), which is the steady state of a live stream. */
  def statefulUserCounts(spark: SparkSession, events: DataFrame,
      idleTimeout: String = "30 minutes"): Dataset[UserCount] = {
    import spark.implicits._
    events.select(col("user_id").cast("long")).as[Long]
      .groupByKey(identity)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.ProcessingTimeTimeout) {
        (userId: Long, rows: Iterator[Long], state: GroupState[Long]) =>
          if (state.hasTimedOut) {
            // idle key: evict, emit nothing — the count is simply gone
            state.remove()
            Iterator.empty
          } else {
            val n = state.getOption.getOrElse(0L) + rows.size
            state.update(n)
            state.setTimeoutDuration(idleTimeout)
            Iterator(UserCount(userId, n))
          }
      }
  }

  final case class SessionTag(event_id: Long, user_id: Long, session_id: String)
  private[streaming] final case class SessionState(
    nSessions: Long, lastTs: Long, buffer: List[(Long, Long)])

  /** Event-level STREAMING sessionize — the incremental twin of
    * [[graft.operators.Behavior.sessionize]], with identical boundary
    * semantics: a session breaks when the gap to the user's previous
    * event reaches `gapSeconds`, ids are `<user>#<n>` with n counting
    * the user's sessions in event-time order from 1, ties on ts order
    * by event_id (EventStreamsSpec proves incremental == batch on the
    * shared rules).
    *
    * Why not a window: the batch operator's gaps-and-islands
    * lag+running-sum needs the user's whole ordered history — in a
    * stream that history never ends. Instead, per-user state buffers
    * ONLY the events still inside the watermark allowance; everything
    * older is FINAL (a session id counts breaks at-or-before its event,
    * and the watermark guarantees no earlier arrival can insert a new
    * break), so each trigger emits the newly-finalized prefix in ts
    * order and keeps `(session count, last final ts)` — two scalars —
    * as the only permanent state. An event-time timeout re-fires the
    * group when the watermark passes buffered events with no new data.
    * Events later than the watermark are dropped (the standard
    * contract, same as every built-in watermarked op). State: O(events
    * within the allowance) per ACTIVE user + O(1) per seen user; at
    * 100 TB the O(1) residue is the deliberate trade for stable session
    * numbering (evicting idle users — the [[statefulUserCounts]]
    * timeout pattern — would restart their numbering). */
  /** The finalized-prefix operators' watermark floor in micros.
    * `getCurrentWatermarkMs()` returns 0 before ANY watermark exists
    * (the first micro-batches); treating that 0 as a real watermark
    * inside the state function would finalize or drop events against a
    * phantom 1970 boundary. MinValue keeps everything buffered until a
    * genuine watermark is established.
    *
    * Engine boundary, documented honestly: Spark's OWN late-row filter
    * runs UPSTREAM of flatMapGroupsWithState against that same initial
    * 0 watermark, so pre-epoch (negative-micros) events arriving in
    * the first micro-batches are dropped by the ENGINE before any
    * state function sees them (EventStreamsSpec pins this). Streams of
    * historical pre-1970 data diverge from the batch operators for
    * exactly those rows — a Spark watermark-model property, not an
    * operator choice; this floor only guarantees the state machines
    * add no second phantom boundary of their own. */
  private def watermarkFloorMicros(wmMs: Long): Long =
    if (wmMs == 0L) Long.MinValue else wmMs * 1000L

  def sessionTags(spark: SparkSession, events: DataFrame,
      gapSeconds: Long = 1800L,
      watermark: String = "10 minutes"): Dataset[SessionTag] = {
    import spark.implicits._
    val gapMicros = gapSeconds * 1000000L
    // the watermarked TIMESTAMP attribute must survive into the grouping
    // input (the unsupported-op checker requires it for event-time
    // timeouts), so it rides the tuple alongside its micros projection
    events.withWatermark("ts", watermark)
      .select(col("user_id").cast("long"), col("event_id").cast("long"),
        unix_micros(col("ts")), col("ts"))
      .as[(Long, Long, Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, rows: Iterator[(Long, Long, Long, java.sql.Timestamp)],
            state: GroupState[SessionState]) =>
          val st = state.getOption.getOrElse(SessionState(0L, Long.MinValue, Nil))
          val wmMicros = watermarkFloorMicros(state.getCurrentWatermarkMs())
          // too-late arrivals (older than the watermark) drop here; the
          // buffered events below the watermark became final instead
          val fresh = rows.map(r => (r._3, r._2)).filter(_._1 >= wmMicros)
          val merged = (st.buffer ++ fresh).sorted
          val (fin, keep) = merged.partition(_._1 < wmMicros)
          var n = st.nSessions
          var last = st.lastTs
          val out = fin.map { case (tsUs, eid) =>
            if (n == 0L || tsUs - last >= gapMicros) n += 1
            last = tsUs
            SessionTag(eid, userId, s"$userId#$n")
          }
          state.update(SessionState(n, last, keep))
          // re-fire this group the moment the watermark passes the oldest
          // buffered event (strictly after the current watermark, per the
          // timeout contract)
          keep.headOption.foreach(b =>
            state.setTimeoutTimestamp(b._1 / 1000L + 1L))
          out.iterator
      }
  }

  final case class TouchAttribution(event_id: Long, user_id: Long,
    conv_ts: java.sql.Timestamp, touch_ts: Option[java.sql.Timestamp],
    channel: Option[String])
  private[streaming] final case class AttribState(
    lastTouchTs: Long, lastChannel: String,
    buffer: List[(Long, Int, Long, String)])

  /** STREAMING last-touch attribution — the incremental twin of
    * [[graft.operators.Behavior.lastTouch]] under the same semantics:
    * each conversion attributes to the user's LATEST touch at-or-before
    * it within the lookback, same-timestamp touch ties resolving to the
    * MAX channel, organic conversions emitting null channel/touch_ts.
    *
    * Same finalized-prefix construction as [[sessionTags]]: all touch
    * and conversion events buffer within the watermark allowance; once
    * the watermark passes them they fold in ascending (ts, kind) order
    * — touches before conversions at equal ts, so at-or-before
    * includes the tie exactly like the batch as-of join — and each
    * finalized conversion emits exactly once. A finalized touch can
    * only ever be SHADOWED by a later touch, never un-finalized, so
    * the permanent per-user state is just the (ts, channel) of the
    * latest finalized touch plus the in-allowance buffer — bounded by
    * allowance × arrival rate, independent of history length. */
  def touchAttributions(spark: SparkSession, events: DataFrame,
      convType: String, touchTypes: Seq[String], lookbackMicros: Long,
      watermark: String = "10 minutes"): Dataset[TouchAttribution] = {
    import spark.implicits._
    require(touchTypes.nonEmpty, "need at least one touch event type")
    require(lookbackMicros > 0,
      s"lookback must be positive micros, got $lookbackMicros")
    require(!touchTypes.contains(convType),
      s"'$convType' cannot be both conversion and touch")
    events.withWatermark("ts", watermark)
      .filter(col("event_type").isin((convType +: touchTypes): _*))
      .select(col("user_id").cast("long"), col("event_id").cast("long"),
        unix_micros(col("ts")),
        when(col("event_type") === convType, lit(1)).otherwise(lit(0)),
        col("event_type"), col("ts"))
      .as[(Long, Long, Long, Int, String, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout) {
        (userId: Long,
            rows: Iterator[(Long, Long, Long, Int, String, java.sql.Timestamp)],
            state: GroupState[AttribState]) =>
          val st = state.getOption
            .getOrElse(AttribState(Long.MinValue, "", Nil))
          val wmMicros = watermarkFloorMicros(state.getCurrentWatermarkMs())
          val fresh = rows.map(r => (r._3, r._4, r._2, r._5))
            .filter(_._1 >= wmMicros)
          // ascending (ts, kind): same-ts touches fold before the
          // conversion they tie with — the batch at-or-before contract
          val merged = (st.buffer ++ fresh).sorted
          val (fin, keep) = merged.partition(_._1 < wmMicros)
          var lastTs = st.lastTouchTs
          var lastCh = st.lastChannel
          val out = fin.flatMap { case (tsUs, kind, eid, etype) =>
            if (kind == 0) {
              // same-ts touches pre-reduce to the max channel, exactly
              // like the batch operator's (user, ts) reduction
              if (tsUs == lastTs) lastCh = Ordering[String].max(lastCh, etype)
              else { lastTs = tsUs; lastCh = etype }
              None
            } else {
              val attributed = lastTs != Long.MinValue &&
                tsUs - lastTs <= lookbackMicros
              Some(TouchAttribution(eid, userId,
                java.sql.Timestamp.from(
                  java.time.Instant.EPOCH.plusNanos(tsUs * 1000L)),
                if (attributed) Some(java.sql.Timestamp.from(
                  java.time.Instant.EPOCH.plusNanos(lastTs * 1000L)))
                else None,
                if (attributed) Some(lastCh) else None))
            }
          }
          state.update(AttribState(lastTs, lastCh, keep))
          keep.headOption.foreach(b =>
            state.setTimeoutTimestamp(b._1 / 1000L + 1L))
          out.iterator
      }
  }

  final case class LinearAttribution(event_id: Long, user_id: Long,
    conv_ts: java.sql.Timestamp, channel: Option[String], credit_m: Long)
  private[streaming] final case class LinAttribState(
    touches: List[(Long, String)], buffer: List[(Long, Int, Long, String)])

  /** STREAMING linear multi-touch attribution — the incremental twin of
    * [[graft.operators.Behavior.linearAttribution]]: each finalized
    * conversion splits its 1e6 micros equally over the user's in-window
    * touches (per channel, `nc·1e6 div n` — the batch operator's exact
    * integral arithmetic), organic conversions emitting one NULL-channel
    * row with the full credit.
    *
    * Same finalized-prefix construction as [[touchAttributions]], with
    * one real difference: last-touch state is two scalars, but linear
    * attribution GENUINELY needs every in-window touch, so the permanent
    * state is the finalized touches still inside the lookback of any
    * possible future conversion — bounded by lookback × touch rate (the
    * model's own window, not history length; the batch join buffers the
    * same window per conversion). Touches prune twice: past each
    * conversion's window as it folds, and past `watermark − lookback`
    * at batch end, since every future conversion finalizes at-or-after
    * the watermark. */
  def linearAttributions(spark: SparkSession, events: DataFrame,
      convType: String, touchTypes: Seq[String], lookbackMicros: Long,
      watermark: String = "10 minutes"): Dataset[LinearAttribution] = {
    import spark.implicits._
    require(touchTypes.nonEmpty, "need at least one touch event type")
    require(lookbackMicros > 0,
      s"lookback must be positive micros, got $lookbackMicros")
    require(!touchTypes.contains(convType),
      s"'$convType' cannot be both conversion and touch")
    def toTs(us: Long) = java.sql.Timestamp.from(
      java.time.Instant.EPOCH.plusNanos(us * 1000L))
    events.withWatermark("ts", watermark)
      .filter(col("event_type").isin((convType +: touchTypes): _*))
      .select(col("user_id").cast("long"), col("event_id").cast("long"),
        unix_micros(col("ts")),
        when(col("event_type") === convType, lit(1)).otherwise(lit(0)),
        col("event_type"), col("ts"))
      .as[(Long, Long, Long, Int, String, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout) {
        (userId: Long,
            rows: Iterator[(Long, Long, Long, Int, String, java.sql.Timestamp)],
            state: GroupState[LinAttribState]) =>
          val st = state.getOption.getOrElse(LinAttribState(Nil, Nil))
          val wmMicros = watermarkFloorMicros(state.getCurrentWatermarkMs())
          val fresh = rows.map(r => (r._3, r._4, r._2, r._5))
            .filter(_._1 >= wmMicros)
          // ascending (ts, kind): same-ts touches fold before the
          // conversion they tie with — at-or-before includes the tie
          val merged = (st.buffer ++ fresh).sorted
          val (fin, keep) = merged.partition(_._1 < wmMicros)
          var touches = st.touches // ascending ts, in-lookback suffix
          val out = List.newBuilder[LinearAttribution]
          fin.foreach { case (tsUs, kind, eid, etype) =>
            if (kind == 0) touches = touches :+ ((tsUs, etype))
            else {
              // prune past THIS conversion's window first — later
              // conversions are at-or-after it, so nothing pruned here
              // could serve them either
              touches = touches.dropWhile(t => tsUs - t._1 > lookbackMicros)
              if (touches.isEmpty)
                out += LinearAttribution(eid, userId, toTs(tsUs),
                  None, 1000000L)
              else {
                val n = touches.size.toLong
                touches.groupBy(_._2).foreach { case (ch, g) =>
                  out += LinearAttribution(eid, userId, toTs(tsUs),
                    Some(ch), g.size.toLong * 1000000L / n)
                }
              }
            }
          }
          if (wmMicros != Long.MinValue)
            touches = touches.dropWhile(t => wmMicros - t._1 > lookbackMicros)
          state.update(LinAttribState(touches, keep))
          keep.headOption.foreach(b =>
            state.setTimeoutTimestamp(b._1 / 1000L + 1L))
          out.result().iterator
      }
  }

  final case class CreditAttribution(event_id: Long, user_id: Long,
    conv_ts: java.sql.Timestamp, channel: Option[String], credit_m: Long)

  /** Shared finalized-prefix fold for the lookback-buffered attribution
    * twins ([[positionAttributions]], [[timeDecayAttributions]]) — the
    * [[linearAttributions]] construction with the per-conversion credit
    * rule injected: permanent state is the finalized touches still
    * inside the lookback of any possible future conversion (bounded by
    * lookback × touch rate), touches prune past each conversion's
    * window as it folds and past `watermark − lookback` at batch end,
    * and each finalized conversion emits once with whatever credit rows
    * `credit(inWindowTouches, convTsMicros)` returns (empty window ⇒
    * the organic NULL-channel row with the full 1e6). */
  private def creditAttributions(spark: SparkSession, events: DataFrame,
      convType: String, touchTypes: Seq[String], lookbackMicros: Long,
      watermark: String)(
      credit: (List[(Long, String)], Long) => List[(Option[String], Long)])
      : Dataset[CreditAttribution] = {
    import spark.implicits._
    require(touchTypes.nonEmpty, "need at least one touch event type")
    require(lookbackMicros > 0,
      s"lookback must be positive micros, got $lookbackMicros")
    require(!touchTypes.contains(convType),
      s"'$convType' cannot be both conversion and touch")
    def toTs(us: Long) = java.sql.Timestamp.from(
      java.time.Instant.EPOCH.plusNanos(us * 1000L))
    events.withWatermark("ts", watermark)
      .filter(col("event_type").isin((convType +: touchTypes): _*))
      .select(col("user_id").cast("long"), col("event_id").cast("long"),
        unix_micros(col("ts")),
        when(col("event_type") === convType, lit(1)).otherwise(lit(0)),
        col("event_type"), col("ts"))
      .as[(Long, Long, Long, Int, String, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout) {
        (userId: Long,
            rows: Iterator[(Long, Long, Long, Int, String, java.sql.Timestamp)],
            state: GroupState[LinAttribState]) =>
          val st = state.getOption.getOrElse(LinAttribState(Nil, Nil))
          val wmMicros = watermarkFloorMicros(state.getCurrentWatermarkMs())
          val fresh = rows.map(r => (r._3, r._4, r._2, r._5))
            .filter(_._1 >= wmMicros)
          // ascending (ts, kind): same-ts touches fold before the
          // conversion they tie with — at-or-before includes the tie
          val merged = (st.buffer ++ fresh).sorted
          val (fin, keep) = merged.partition(_._1 < wmMicros)
          var touches = st.touches // ascending ts, in-lookback suffix
          val out = List.newBuilder[CreditAttribution]
          fin.foreach { case (tsUs, kind, eid, etype) =>
            if (kind == 0) touches = touches :+ ((tsUs, etype))
            else {
              touches = touches.dropWhile(t => tsUs - t._1 > lookbackMicros)
              val creditRows =
                if (touches.isEmpty) List((None: Option[String], 1000000L))
                else credit(touches, tsUs)
              creditRows.foreach { case (ch, cm) =>
                out += CreditAttribution(eid, userId, toTs(tsUs), ch, cm) }
            }
          }
          if (wmMicros != Long.MinValue)
            touches = touches.dropWhile(t => wmMicros - t._1 > lookbackMicros)
          state.update(LinAttribState(touches, keep))
          keep.headOption.foreach(b =>
            state.setTimeoutTimestamp(b._1 / 1000L + 1L))
          out.result().iterator
      }
  }

  /** STREAMING position-based (U-shaped 40/20/40) attribution — the
    * incremental twin of
    * [[graft.operators.Behavior.positionAttribution]]: each finalized
    * conversion orders its in-window touches by `(touch_ts, channel)`
    * (the batch row_number order), credits the first and last 400000
    * micros each, splits 200000 integrally over the middles
    * (`200000 div (n−2)` each), with the 1-touch (full 1e6) and 2-touch
    * (500000 each) conventions, summed per channel; organic conversions
    * emit the NULL-channel row. State is the [[linearAttributions]]
    * lookback buffer — "first in-window touch" depends on each
    * conversion's own window start, so first/last/count scalars alone
    * cannot survive window trimming; the buffer is the bounded honest
    * form (lookback × touch rate, never history length). */
  def positionAttributions(spark: SparkSession, events: DataFrame,
      convType: String, touchTypes: Seq[String], lookbackMicros: Long,
      watermark: String = "10 minutes"): Dataset[CreditAttribution] =
    creditAttributions(spark, events, convType, touchTypes, lookbackMicros,
        watermark) { (win, _) =>
      val ordered = win.sortBy(identity) // (ts, channel): the batch order
      val n = ordered.size
      val credits = ordered.zipWithIndex.map { case ((_, ch), i) =>
        val cm =
          if (n == 1) 1000000L
          else if (n == 2) 500000L
          else if (i == 0 || i == n - 1) 400000L
          else 200000L / (n - 2)
        ch -> cm
      }
      credits.groupBy(_._1).toList.map { case (ch, g) =>
        (Some(ch): Option[String]) -> g.map(_._2).sum }
    }

  /** STREAMING time-decay attribution — the incremental twin of
    * [[graft.operators.Behavior.timeDecayAttribution]]: each finalized
    * conversion weighs every in-window touch by the batch operator's
    * quantized half-life weight `max(1, 1e6 div 2^(age div halfLife))`
    * (the 1-micro floor keeps all-ancient-touch conversions credited),
    * and emits per-channel `Σ_channel w · 1e6 div Σ_all w` micros.
    * Emission happens AT the conversion from the lookback-buffered
    * touch ages — by then every in-window touch is finalized, so no
    * weight can change after emit; state is exactly the
    * [[linearAttributions]] buffer. */
  def timeDecayAttributions(spark: SparkSession, events: DataFrame,
      convType: String, touchTypes: Seq[String], lookbackMicros: Long,
      halfLifeMicros: Long, watermark: String = "10 minutes")
      : Dataset[CreditAttribution] = {
    require(halfLifeMicros > 0,
      s"half-life must be positive micros, got $halfLifeMicros")
    require(lookbackMicros / halfLifeMicros < 62,
      s"lookback spans ${lookbackMicros / halfLifeMicros} half-lives — " +
        "beyond 62 the integer weight underflows the shift; widen the " +
        "half-life or narrow the lookback")
    creditAttributions(spark, events, convType, touchTypes, lookbackMicros,
        watermark) { (win, convTs) =>
      val weighted = win.map { case (tsUs, ch) =>
        val k = ((convTs - tsUs) / halfLifeMicros).toInt
        ch -> math.max(1L, 1000000L / (1L << k))
      }
      val tw = weighted.map(_._2).sum
      weighted.groupBy(_._1).toList.map { case (ch, g) =>
        (Some(ch): Option[String]) -> g.map(_._2).sum * 1000000L / tw }
    }
  }

  final case class FunnelReach(user_id: Long, step: Int, event_type: String)
  private[streaming] final case class FunnelState(
    stage: Int, firstTs: Long, buffer: List[(Long, Long)])

  /** STREAMING ordered funnel — the incremental twin of
    * [[graft.operators.Behavior.funnel]] under the same semantics: a
    * user advances to step j on the EARLIEST step-j event strictly
    * after their first completion of step j−1 (within the optional
    * conversion deadline). Emits one [[FunnelReach]] record per (user,
    * stage) the first time the stage completes; funnel counts are a
    * downstream `groupBy(step).count` (EventStreamsSpec proves the
    * emitted reach == the batch operator's per-step counts).
    *
    * Same finalized-prefix construction as [[sessionTags]]: ascending
    * event-time order makes the fold's first qualifying match the
    * batch MIN by construction, and a stage completion is final once
    * the watermark passes it (no earlier arrival can precede it). The
    * input prunes map-side to the step types, so per-user state is the
    * (stage, firstTs) pair plus only in-allowance STEP events. */
  final case class TransitionEvent(user_id: Long, from_type: String,
    to_type: String)
  private[streaming] final case class MarkovState(
    lastTs: Long, lastId: Long, lastType: String,
    buffer: List[(Long, Long, String)])

  /** STREAMING first-order transitions — the incremental twin of
    * [[graft.operators.Behavior.markovTransitions]]: per user, each
    * consecutive event pair in (ts, event_id) order emits one
    * [[TransitionEvent]] once the LATER event finalizes; the transition
    * matrix is a downstream `groupBy(from,to).count` (the funnelReach
    * emit-then-aggregate shape, EventStreamsSpec proves count parity).
    *
    * Same finalized-prefix construction as [[sessionTags]]: events
    * buffer within the watermark allowance, fold in ascending
    * (ts, event_id) order — the batch window's exact tiebreak — and a
    * pair is final once the watermark passes its later member (no
    * in-allowance arrival can sit between two finalized events).
    * Permanent per-user state is ONE (ts, id, type) triple — the last
    * finalized event — plus the in-allowance buffer: bounded by
    * allowance × arrival rate, independent of history length. */
  def transitionEvents(spark: SparkSession, events: DataFrame,
      watermark: String = "10 minutes"): Dataset[TransitionEvent] = {
    import spark.implicits._
    events.withWatermark("ts", watermark)
      .select(col("user_id").cast("long"), col("event_id").cast("long"),
        col("event_type").cast("string"), unix_micros(col("ts")), col("ts"))
      .as[(Long, Long, String, Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout) {
        (userId: Long,
            rows: Iterator[(Long, Long, String, Long, java.sql.Timestamp)],
            state: GroupState[MarkovState]) =>
          val st = state.getOption.getOrElse(
            MarkovState(Long.MinValue, 0L, null, Nil))
          val wmMicros = watermarkFloorMicros(state.getCurrentWatermarkMs())
          val fresh = rows.map(r => (r._4, r._2, r._3)).filter(_._1 >= wmMicros)
          val merged = (st.buffer ++ fresh).sortBy(e => (e._1, e._2))
          val (fin, keep) = merged.partition(_._1 < wmMicros)
          var last = (st.lastTs, st.lastId, st.lastType)
          val out = fin.flatMap { case (tsUs, eid, tpe) =>
            val prev = last
            last = (tsUs, eid, tpe)
            Option(prev._3).map(TransitionEvent(userId, _, tpe))
          }
          state.update(MarkovState(last._1, last._2, last._3, keep))
          keep.headOption.foreach(b =>
            state.setTimeoutTimestamp(b._1 / 1000L + 1L))
          out.iterator
      }
  }

  def funnelReach(spark: SparkSession, events: DataFrame,
      steps: Seq[String], withinSeconds: Option[Long] = None,
      watermark: String = "10 minutes"): Dataset[FunnelReach] = {
    import spark.implicits._
    require(steps.nonEmpty, "funnel needs at least one step")
    require(steps.distinct.length == steps.length,
      s"funnel steps must be distinct, got ${steps.mkString(", ")}")
    withinSeconds.foreach(w =>
      require(w > 0, s"withinSeconds must be positive, got $w"))
    val deadlineMicros = withinSeconds.map(_ * 1000000L)
    events.withWatermark("ts", watermark)
      .filter(col("event_type").isin(steps: _*))
      .select(col("user_id").cast("long"),
        array_position(typedLit(steps), col("event_type")).cast("long") - 1L,
        unix_micros(col("ts")), col("ts"))
      .as[(Long, Long, Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, rows: Iterator[(Long, Long, Long, java.sql.Timestamp)],
            state: GroupState[FunnelState]) =>
          val st = state.getOption.getOrElse(FunnelState(0, Long.MinValue, Nil))
          val wmMicros = watermarkFloorMicros(state.getCurrentWatermarkMs())
          val fresh = rows.map(r => (r._3, r._2)).filter(_._1 >= wmMicros)
          val merged = (st.buffer ++ fresh).sorted
          val (fin, keep) = merged.partition(_._1 < wmMicros)
          var stage = st.stage
          var firstTs = st.firstTs
          val out = List.newBuilder[FunnelReach]
          fin.foreach { case (tsUs, sIdx) =>
            if (stage < steps.length && sIdx == stage &&
                (stage == 0 ||
                  (tsUs > firstTs &&
                    deadlineMicros.forall(d => tsUs <= firstTs + d)))) {
              stage += 1
              firstTs = tsUs
              out += FunnelReach(userId, stage, steps(stage - 1))
            }
          }
          state.update(FunnelState(stage, firstTs, keep))
          keep.headOption.foreach(b =>
            state.setTimeoutTimestamp(b._1 / 1000L + 1L))
          out.result().iterator
      }
  }

  final case class RetentionCell(user_id: Long,
    cohort_week: java.time.LocalDate, week_offset: Int)
  private[streaming] final case class RetentionState(
    cohortDay: Long, emitted: List[Long], buffer: List[Long])

  /** STREAMING weekly retention — the incremental twin of
    * [[graft.operators.Behavior.retention]]: emits one [[RetentionCell]]
    * per (user, week-offset) the first time that activity week
    * finalizes; cohort counts are the downstream
    * `groupBy(cohort_week, week_offset).count` (StreamingPropertySpec
    * proves the emitted cells == the batch operator's counts under
    * random arrival orders and batch splits).
    *
    * Same finalized-prefix construction as [[sessionTags]]: events
    * below the watermark finalize in ascending event-time order, so
    * the FIRST finalized event pins the user's cohort week permanently
    * — any later arrival carries ts >= watermark > that event, and
    * can therefore never predate it. Week truncation is the Monday of
    * the event's UTC day, matching `date_trunc("week", ts)` under the
    * engine's UTC session timezone. Per-user state is the cohort day,
    * the emitted offset list (one entry per ACTIVE week — bounded by
    * the observation span, not the event count), and only
    * in-allowance buffered event times. */
  def retentionCells(spark: SparkSession, events: DataFrame,
      watermark: String = "10 minutes"): Dataset[RetentionCell] = {
    import spark.implicits._
    def mondayOf(us: Long): Long = {
      val d = java.time.LocalDate.ofEpochDay(Math.floorDiv(us, 86400000000L))
      d.minusDays(d.getDayOfWeek.getValue - 1L).toEpochDay
    }
    events.withWatermark("ts", watermark)
      .select(col("user_id").cast("long"), unix_micros(col("ts")), col("ts"))
      .as[(Long, Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, rows: Iterator[(Long, Long, java.sql.Timestamp)],
            state: GroupState[RetentionState]) =>
          val st = state.getOption.getOrElse(
            RetentionState(Long.MinValue, Nil, Nil))
          val wmMicros = watermarkFloorMicros(state.getCurrentWatermarkMs())
          val fresh = rows.map(_._2).filter(_ >= wmMicros)
          val merged = (st.buffer ++ fresh).sorted
          val (fin, keep) = merged.partition(_ < wmMicros)
          var cohort = st.cohortDay
          var emitted = st.emitted
          val out = List.newBuilder[RetentionCell]
          fin.foreach { us =>
            val wk = mondayOf(us)
            if (cohort == Long.MinValue) cohort = wk
            val off = (wk - cohort) / 7L
            if (!emitted.contains(off)) {
              emitted = off :: emitted
              out += RetentionCell(userId,
                java.time.LocalDate.ofEpochDay(cohort), off.toInt)
            }
          }
          state.update(RetentionState(cohort, emitted, keep))
          keep.headOption.foreach(b =>
            state.setTimeoutTimestamp(b / 1000L + 1L))
          out.result().iterator
      }
  }

  /** Drive a stream to a named in-memory table synchronously (local
    * smoke path; production uses real sinks + triggers). */
  def runToMemory(df: DataFrame, name: String, mode: String): StreamingQuery = {
    val q = df.writeStream.outputMode(mode).format("memory").queryName(name).start()
    q.processAllAvailable()
    q
  }

  /** Events-shaped stream from the built-in rate source — the
    * connector-less stand-in for an external stream (Kafka/kinesis jars
    * are deliberately absent here): monotonically increasing `value`
    * becomes the event id, so offset-resume behavior is directly
    * observable in the data. Every downstream operator (tumbling/session
    * windows, dedup, stateful counts) accepts this frame unchanged. */
  def rateEvents(spark: SparkSession, rowsPerSecond: Int): DataFrame =
    spark.readStream.format("rate")
      .option("rowsPerSecond", rowsPerSecond).load()
      .select(col("value").as("event_id"),
        col("timestamp").as("ts"),
        pmod(col("value"), lit(97)).as("user_id"),
        element_at(array(lit("click"), lit("view"), lit("error")),
          (pmod(col("value"), lit(3)) + 1).cast("int")).as("event_type"),
        (pmod(col("value"), lit(100)) / 10.0).as("value"),
        lit("""{"k":1}""").as("props"))

  /** Start a stream with an explicit trigger + checkpoint — the
    * production shape (`runToMemory` is the trigger-less smoke path).
    * `Trigger.AvailableNow` drains what exists then stops (batch-like
    * catch-up runs); `Trigger.ProcessingTime` is the steady-state
    * micro-batch cadence. Restarting with the same checkpoint resumes
    * from the committed offsets, never from scratch. */
  def runWithTrigger(df: DataFrame, name: String, mode: String,
      trigger: Trigger, checkpointDir: String): StreamingQuery =
    df.writeStream.outputMode(mode).format("memory").queryName(name)
      .trigger(trigger).option("checkpointLocation", checkpointDir).start()

  /** Exactly-once file sink via idempotent foreachBatch: every micro-batch
    * lands in its OWN `batch=<id>` directory with overwrite semantics, so
    * a batch replayed after a crash-between-write-and-commit simply
    * overwrites its previous (possibly partial) output instead of
    * appending duplicates — idempotence is what upgrades streaming's
    * at-least-once replay into end-to-end exactly-once on a plain file
    * sink. This is the foreachBatch pattern for sinks without
    * transactional commit (JDBC upserts follow the same shape, keyed on
    * the batch id). Readers see `batch=<id>` as just another partition
    * column. */
  def runToIdempotentParquet(df: DataFrame, outDir: String,
      trigger: Trigger, checkpointDir: String): StreamingQuery =
    df.writeStream.outputMode("append")
      .trigger(trigger).option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        batch.write.mode("overwrite").parquet(s"$outDir/batch=$batchId")
      }
      .start()

  /** CONTINUOUS corpus-ingest dedup: every micro-batch of documents
    * classifies against the signatures of all prior batches (exact
    * hash + MinHash-LSH near-dup, the [[graft.operators.Dedup]]
    * nightly pair run per trigger), accepted docs land in
    * replay-idempotent `batch=<id>` parquet, and the batch's own
    * signatures fold into the store for the NEXT trigger — the
    * corpus text is never re-scanned, exactly like the nightly loop.
    * All the exactly-once and empty-store handling lives in
    * [[graft.operators.Dedup.ingestBatch]] (batch-testable; see its
    * scaladoc for the replay contract). */
  def streamingIngestDedup(docs: DataFrame, sigDir: String, outDir: String,
      checkpointDir: String, textCol: String = "text",
      idCol: String = "doc_id", shingleK: Int = 3, numHashes: Int = 8,
      rowsPerBand: Int = 2, thresholdTenths: Int = 1): StreamingQuery =
    docs.writeStream.outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        graft.operators.Dedup.ingestBatch(batch.toDF(), batchId, sigDir,
          outDir, textCol, idCol, shingleK, numHashes, rowsPerBand,
          thresholdTenths)
        ()
      }
      .start()

  /** STREAMING pairwise-preference counts — the incremental twin of
    * [[graft.operators.Preferences.pairCounts]] (and therefore of every
    * Copeland/cycle derivation over it): the canonical-pair win counters
    * are pure monotone sums, order-independent by construction, so the
    * twin is a plain streaming aggregation — no finalized-prefix fold is
    * needed (there is no "too late to matter" event; a judgment only
    * ever increments its pair). Permanent state is exactly the
    * candidates² counter relation — bounded by the candidate set
    * (models/variants), never by judgment volume. Run with the
    * `complete` output mode; self-preferences and null candidates are
    * excluded like the batch operator. Returns
    * `(a, b, wins_ab, wins_ba)`. */
  /** STREAMING answer-vote counts — the incremental twin of
    * [[graft.operators.Profile.selfConsistency]]'s vote table (and
    * therefore of the mode/accuracy derivation over it): per-question
    * per-answer tallies are pure monotone sums, order-independent by
    * construction, so the twin is a plain streaming aggregation — the
    * [[preferenceCounts]] argument verbatim (a sample only ever
    * increments its own (question, answer) cell; there is no "too late"
    * event). Null answers are KEPT as their own counter row — they are
    * the abstention count the batch operator reports as `n_null`; the
    * mode/verdict derivation downstream runs over the (bounded)
    * counter relation in batch. Permanent state = distinct (question,
    * answer) cells — bounded by answer diversity, never by sample
    * volume. Run with `complete` output mode. Returns
    * `(<qCol>, answer, votes)`. */
  def answerVoteCounts(spark: SparkSession, samples: DataFrame,
      qCol: String, ansCol: String): DataFrame =
    samples
      .filter(col(qCol).isNotNull)
      .select(col(qCol), col(ansCol).cast("string").as("answer"))
      .groupBy(col(qCol), col("answer"))
      .agg(count(lit(1)).as("votes"))

  /** Streaming best-of-n twin ([[graft.operators.Preferences.bestOfN]]
    * incremental): the per-prompt reward top-k as scored samples
    * STREAM in — rejection sampling over a live generation feed. The
    * shared bounded top-k buffer is a MONOTONE order-independent
    * reduction (inserting a sample can only improve the kept set, ties
    * to the lower response id regardless of arrival order), so plain
    * complete-mode aggregation carries it: no finalized-prefix fold,
    * no watermark, state bounded by prompts × k — the
    * [[preferenceCounts]] stance, and the parity spec derives the
    * batch bestOfN relation from the streamed buffers exactly across
    * batch splits. Null prompt/response/reward rows are unjudged —
    * excluded (count upstream). Rewards beyond 2^53 micros would lose
    * exactness in the buffer's double score — guarded in-plan on the
    * value path (the batch [[graft.operators.Preferences.bestOfN]]
    * guard, kept identical so the parity spec stays meaningful).
    * Returns `(<promptCol>, top: array<struct<score, id>>,
    * n_samples)`. */
  def rewardTopK(spark: SparkSession, samples: DataFrame,
      promptCol: String, respIdCol: String, rewardMicrosCol: String,
      k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val doubleExact = 9007199254740992L // 2^53
    val guardedReward = when(
      abs(col(rewardMicrosCol).cast("long")) > lit(doubleExact),
      raise_error(concat(
        lit("rewardTopK: |reward_micros| exceeds 2^53 ("),
        col(rewardMicrosCol).cast("string"),
        lit(") — the top-k buffer carries scores as doubles; rescale " +
          "the reward upstream"))).cast("long")
    ).otherwise(col(rewardMicrosCol).cast("long"))
    samples
      .filter(col(promptCol).isNotNull && col(respIdCol).isNotNull &&
        col(rewardMicrosCol).isNotNull)
      .groupBy(col(promptCol))
      .agg(graft.functions.TopKAggregator.topKColumn(k)(
        guardedReward.cast("double"),
        col(respIdCol).cast("long")).as("top"),
        count(lit(1)).as("n_samples"))
  }

  /** Streaming embedding-stats twin
    * ([[graft.operators.Similarity.embeddingDrift]] incremental) — the
    * monitoring shape drift is FOR: today's vectors arrive as a stream,
    * and the state that the drift numbers derive from is the per-dim
    * running sums `(dim, n, s1 = Σv, s2 = Σv²)` — dims-bounded
    * regardless of stream volume, pure monotone sums (complete-mode
    * aggregation, no watermark, order-independent). Every drift output
    * derives from this relation in batch: per-dim centroid =
    * round(s1/n, 6) through FLOAT (the kmeans float discipline), mean
    * squared norm = round(Σ_dims s2 / n, 6) in exact micros (vector-
    * major vs dim-major double summation agree after the 6-dp round —
    * the same partition-order-insensitivity the batch operator's avg
    * already relies on), n = any dim's count. Null and EMPTY vectors
    * are excluded exactly as in the batch operator. The parity spec
    * derives the batch drift numbers from the streamed state across a
    * batch split. Run with `complete` output mode. */
  def embeddingDimStats(spark: SparkSession, vecs: DataFrame,
      vecCol: String = "embedding"): DataFrame =
    vecs.filter(col(vecCol).isNotNull && size(col(vecCol)) > 0)
      .select(posexplode(col(vecCol)).as(Seq("dim", "__v")))
      .select(col("dim"), col("__v").cast("double").as("__v"))
      .groupBy(col("dim"))
      .agg(count(lit(1)).as("n"), sum(col("__v")).as("s1"),
        sum(col("__v") * col("__v")).as("s2"))

  /** Streaming token-count state
    * ([[graft.operators.TextAnalysis.tokenKlDrift]]'s monitoring twin)
    * — the corpus-refresh alarm's live half: documents arrive as a
    * stream and the state the KL derives from is the per-token count
    * `(tok, c)` — pure MONOTONE counters (complete-mode aggregation,
    * no watermark, order-independent), the [[embeddingDimStats]]
    * stance on text. State is vocab-bounded regardless of stream
    * volume — unigram vocabularies plateau far below row counts;
    * shard the stream by token prefix if a corpus's vocabulary
    * outgrows one state store. Null texts are excluded exactly as in
    * the batch operator. Feed two such states (or one against a batch
    * reference's counts) through
    * [[graft.operators.TextAnalysis.tokenKlFromCounts]] — the
    * IDENTICAL arithmetic the batch composition runs, so the parity
    * spec derives the batch drift numbers bit-for-bit across batch
    * splits. Run with `complete` output mode. */
  def tokenCountState(spark: SparkSession, docs: DataFrame,
      textCol: String = "text"): DataFrame =
    docs.filter(col(textCol).isNotNull)
      .select(explode(graft.operators.TextAnalysis.tokens(
        lower(col(textCol)))).as("tok"))
      .groupBy(col("tok"))
      .agg(count(lit(1)).as("c"))

  /** Streaming KTO verdict counters
    * ([[graft.operators.Preferences.ktoSignal]]'s monitoring twin) —
    * live thumbs-up/down is exactly the feedback shape that ARRIVES
    * as a stream: per-prompt `(n_examples, n_desirable)` are pure
    * monotone counters (complete-mode aggregation, no watermark,
    * order-independent — the [[preferenceCounts]] stance on unpaired
    * verdicts), state bounded by prompts. Null prompt/id/verdict rows
    * are unjudged exactly as in batch. Feed the state through
    * [[graft.operators.Preferences.ktoSignalFromCounts]] with the
    * accumulated examples — the IDENTICAL baseline / centering /
    * balancing arithmetic, so the parity spec derives the batch
    * ktoSignal relation bit-for-bit at every batch split. Run with
    * `complete` output mode. */
  def ktoVerdictCounts(spark: SparkSession, feedback: DataFrame,
      promptCol: String, respIdCol: String,
      desirableCol: String): DataFrame =
    feedback.filter(col(promptCol).isNotNull &&
        col(respIdCol).isNotNull && col(desirableCol).isNotNull)
      .groupBy(col(promptCol))
      .agg(count(lit(1)).as("n_examples"),
        sum(when(col(desirableCol).cast("boolean"), 1L).otherwise(0L))
          .as("n_desirable"))

  /** Streaming tool-call verdict counters
    * ([[graft.operators.Behavior.toolCallRates]]' monitoring twin):
    * agentic traffic ARRIVES as a stream, and the per-tool counter
    * set the monitor derives rates from is pure MONOTONE counts over
    * the audited verdict relation (run
    * [[graft.operators.Behavior.toolCallAudit]] on each micro-batch
    * upstream — its parse/judge stages are map-only + broadcast
    * joins + one call-keyed agg). Complete-mode aggregation, no
    * watermark, order-independent; state bounded by the tool-label
    * vocabulary. Unparseable tools count under `'<unparsed>'`
    * exactly as in the batch roll-up. Feed the state through
    * [[graft.operators.Behavior.toolCallRatesFromCounts]] — identical
    * arithmetic, so the parity spec derives the batch monitor
    * relation bit-for-bit at every batch split. */
  def toolVerdictCounts(spark: SparkSession,
      verdicts: DataFrame): DataFrame =
    verdicts
      .groupBy(coalesce(col("tool"), lit("<unparsed>")).as("tool"))
      .agg(count(lit(1)).as("n_calls"),
        sum(when(col("malformed_json"), 1L).otherwise(0L))
          .as("n_malformed"),
        sum(when(col("unknown_tool"), 1L).otherwise(0L)).as("n_unknown"),
        sum(when(!col("malformed_json") && !col("unknown_tool") &&
          !col("ok"), 1L).otherwise(0L)).as("n_bad_args"),
        sum(when(col("ok"), 1L).otherwise(0L)).as("n_ok"))

  /** Streaming PSI bin-count state
    * ([[graft.operators.Profile.psiDrift]]'s monitoring twin — the
    * LAST untwinned member of the drift-monitor family after
    * [[embeddingDimStats]], [[tokenCountState]] and
    * [[ktoVerdictCounts]]): the live batch a PSI monitor compares
    * against its baseline is exactly the side that ARRIVES as a
    * stream, and the state the PSI derives from is the per-bin count
    * `(bin, n)` against the baseline's FROZEN equi-depth cuts
    * ([[graft.operators.Profile.psiCuts]] — cuts come from the
    * snapshot you compare AGAINST, computed once as nBins−1 literal
    * doubles, never from the drifting stream). Pure MONOTONE counters
    * (complete-mode aggregation, no watermark, order-independent),
    * state bounded by cuts.length + 1 bins regardless of stream
    * volume. Null values are excluded exactly as in the batch
    * operator; the binning rule (count of cuts strictly below the
    * value) is [[graft.operators.Profile.psiBinCounts]]'s verbatim.
    * Feed the state through
    * [[graft.operators.Profile.psiFromCounts]] against the baseline's
    * own [[graft.operators.Profile.psiBinCounts]] — the IDENTICAL
    * spine / floor / `(p − q)·ln(p/q)` arithmetic, so the parity spec
    * derives the batch psiDrift relation bit-for-bit at every batch
    * split. Run with `complete` output mode. */
  def binCountState(spark: SparkSession, df: DataFrame, valueCol: String,
      cuts: Seq[Double]): DataFrame = {
    require(cuts.nonEmpty, "binCountState needs at least one cut")
    val bin = cuts.map(c => when(col(valueCol) > lit(c), 1).otherwise(0))
      .reduce(_ + _)
    df.filter(col(valueCol).isNotNull)
      .select(bin.as("bin"))
      .groupBy(col("bin")).agg(count(lit(1)).as("n"))
  }

  def preferenceCounts(spark: SparkSession, prefs: DataFrame,
      winnerCol: String, loserCol: String): DataFrame = {
    prefs
      .filter(col(winnerCol).isNotNull && col(loserCol).isNotNull &&
        col(winnerCol) =!= col(loserCol))
      .select(least(col(winnerCol), col(loserCol)).as("a"),
        greatest(col(winnerCol), col(loserCol)).as("b"),
        when(col(winnerCol) <= col(loserCol), 1L).otherwise(0L).as("__aw"))
      .groupBy(col("a"), col("b"))
      .agg(sum(col("__aw")).as("wins_ab"),
        (count(lit(1)) - sum(col("__aw"))).as("wins_ba"))
  }
}
