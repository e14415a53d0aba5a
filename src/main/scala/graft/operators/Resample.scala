package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Time-series resampling: project an irregular observation stream onto a
  * uniform per-key time grid with last-observation-carried-forward (LOCF)
  * values — the standard prep for joining event data against
  * fixed-cadence features (pandas `resample().ffill()`, kdb `aj` on a
  * grid).
  *
  * Composition, not a new exec: the grid generates per key as one
  * `sequence` expression (map-side after a tiny per-key min/max agg), and
  * the fill is the library's own native as-of join
  * ([[graft.plans.AsOfJoin]], whole-stage-codegen'd SMJ) from grid points
  * to the latest observation at-or-before each point. Both stages key by
  * the series key: one agg shuffle + the as-of join's sort — nothing
  * scales with grid × observations.
  *
  * The grid starts at the first step boundary AT-OR-AFTER each key's
  * first observation (so every grid point has a defined LOCF value — no
  * null-leading edge) and ends at its last observation. Observations are
  * pre-reduced to one row per (key, ts) with `max(value)` so the as-of
  * match is deterministic under timestamp ties.
  *
  * Returns `(<keyCol>, grid_ts, last_obs_ts, <valueCol>)` — `last_obs_ts`
  * is the provenance timestamp; `grid_ts - last_obs_ts` is the staleness
  * of the carried value.
  */
object Resample {

  /** `maxGridPerKey` bounds the per-key grid (the sequence() array one
    * row holds before exploding): a millisecond step over a month-long
    * key is 2.6e9 points — beyond Spark's sequence cap and a
    * single-task OOM long before that. Keys over the cap fail loudly
    * with the key name instead of dying inside codegen; raise the cap
    * deliberately or coarsen the step. */
  def fillForward(obs: DataFrame, keyCol: String, tsCol: String,
      valueCol: String, stepMicros: Long,
      maxGridPerKey: Long = 10000000L): DataFrame = {
    require(stepMicros > 0, s"step must be positive micros, got $stepMicros")
    require(maxGridPerKey > 0, s"maxGridPerKey must be positive, got $maxGridPerKey")
    val uniq = obs
      .groupBy(col(keyCol), col(tsCol))
      .agg(max(col(valueCol)).as(valueCol))
    val e = unix_micros(col(tsCol))
    // first boundary >= min ts: e0 + (step - e0 % step) % step, integer math
    // a key whose observations all sit inside one step (no boundary in
    // [e0, e1]) yields an empty grid — guarded, since sequence() throws
    // on start > stop
    val g0 = col("e0") + pmod(lit(stepMicros) - pmod(col("e0"), lit(stepMicros)),
      lit(stepMicros))
    val npoints = floor((col("e1") - g0) / lit(stepMicros)) + 1
    val grid = uniq.groupBy(col(keyCol))
      .agg(min(e).as("e0"), max(e).as("e1"))
      .select(col(keyCol), explode(
        when(g0 > col("e1"), array().cast("array<long>"))
          .when(npoints > maxGridPerKey, raise_error(concat(
            lit("fillForward: key "), col(keyCol).cast("string"),
            lit(" needs "), npoints.cast("string"),
            lit(s" grid points (cap $maxGridPerKey) — coarsen the step " +
              "or raise maxGridPerKey"))).cast("array<long>"))
          .otherwise(sequence(g0, col("e1"), lit(stepMicros)))).as("ge"))
      .select(col(keyCol).as("__gk"), timestamp_micros(col("ge")).as("grid_ts"))
    graft.plans.AsOfJoin.asofJoin(
        grid, uniq.select(col(keyCol).as("__ok"), col(tsCol).as("last_obs_ts"),
          col(valueCol)),
        "__gk", "__ok", "grid_ts", "last_obs_ts")
      .select(col("__gk").as(keyCol), col("grid_ts"), col("last_obs_ts"),
        col(valueCol))
  }

  /** Linear-interpolation resampling: same uniform per-key grid as
    * [[fillForward]], but each grid point's value interpolates between
    * the latest observation at-or-before and the earliest at-or-after —
    * BOTH directions of the native as-of join composed back to back
    * (backward for the left bracket, `forward = true` for the right).
    * A grid point landing exactly on an observation takes that
    * observation's value (zero-width bracket). Values round to 6 dp
    * with the same double-arithmetic shape the DuckDB oracle replays
    * (`prev + (next − prev) × frac`, frac divided first), so results
    * hash-match bit-for-bit. Both brackets always exist: the grid spans
    * [first boundary ≥ first obs, last obs].
    *
    * Returns `(<keyCol>, grid_ts, prev_ts, next_ts, <valueCol>)`. */
  def interpolate(obs: DataFrame, keyCol: String, tsCol: String,
      valueCol: String, stepMicros: Long,
      maxGridPerKey: Long = 10000000L): DataFrame = {
    val locf = fillForward(obs, keyCol, tsCol, valueCol, stepMicros,
        maxGridPerKey)
      .select(col(keyCol).as("__gk"), col("grid_ts"),
        col("last_obs_ts").as("prev_ts"), col(valueCol).as("__vp"))
    val uniq = obs.groupBy(col(keyCol), col(tsCol))
      .agg(max(col(valueCol)).as(valueCol))
      .select(col(keyCol).as("__ok"), col(tsCol).as("next_ts"),
        col(valueCol).as("__vn"))
    val frac = (unix_micros(col("grid_ts")) - unix_micros(col("prev_ts")))
      .cast("double") /
      (unix_micros(col("next_ts")) - unix_micros(col("prev_ts"))).cast("double")
    graft.plans.AsOfJoin.asofJoin(locf, uniq,
        "__gk", "__ok", "grid_ts", "next_ts", forward = true)
      .select(col("__gk").as(keyCol), col("grid_ts"), col("prev_ts"),
        col("next_ts"),
        when(col("next_ts") === col("prev_ts"), col("__vp"))
          .otherwise(round(col("__vp") + (col("__vn") - col("__vp")) * frac, 6))
          .as(valueCol))
  }

  /** Trailing time-range aggregation per key — the moving-average /
    * rolling-count shape (pandas `rolling('10min')`, SQL `RANGE BETWEEN
    * INTERVAL ... PRECEDING`): for every observation, count and average
    * the key's observations in the `windowMicros`-wide window ENDING at
    * (and including) it. The frame is a numeric RANGE on epoch
    * microseconds, so both frame boundaries and same-timestamp peer
    * semantics are engine-independent (an interval frame over raw
    * timestamps would tie the row set to each engine's timestamp
    * comparison precision).
    *
    * Determinism: the windowed sum runs over DECIMAL(18,2) — exact and
    * independent of the engine's frame-evaluation order (sliding-window
    * sums are segment trees in some engines, naive re-scans in others;
    * a double sum would differ in ulps between the two) — and the
    * average divides once as double, rounded to 4 dp.
    *
    * Scale shape: one shuffle keyed by `keyCol`, per-key sort inside the
    * window — the partitioned-window shape (never a corpus-wide
    * unpartitioned window). Keys with pathological per-key row counts
    * are the same skew story as every keyed window; salt upstream if one
    * key dominates. */
  def trailingAgg(obs: DataFrame, keyCol: String, tsCol: String,
      valueCol: String, windowMicros: Long): DataFrame = {
    require(windowMicros >= 0, s"windowMicros must be >= 0, got $windowMicros")
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.DecimalType
    val w = Window.partitionBy(col(keyCol))
      .orderBy(unix_micros(col(tsCol)))
      .rangeBetween(-windowMicros, 0)
    // avg divides by the NON-NULL value count (SQL AVG semantics — the
    // null-skipping sum over a null-counting denominator would silently
    // deflate averages on sparse observations); n_win stays the frame's
    // row count, and an all-null frame averages to null, not 0
    obs
      .withColumn("n_win", count(lit(1)).over(w))
      .withColumn("n_val", count(col(valueCol)).over(w))
      .withColumn("sum_dec",
        sum(col(valueCol).cast(DecimalType(18, 2))).over(w))
      .select(col(keyCol), col(tsCol), col(valueCol),
        col("n_win"),
        when(col("n_val") > 0,
          round(col("sum_dec").cast("double") / col("n_val"), 4))
          .as("avg_win"))
  }
}
