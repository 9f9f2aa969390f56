package graft.events

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-time analytics over the driver-provided `events` table
  * (`event_id, ts, user_id, event_type, value, props`).
  *
  * The reference has no temporal operators at all (SURVEY.md §2.5 "no
  * relational windows"), but a training-data ingest pipeline tracks its
  * own telemetry — these are the standard event-time ops, expressed with
  * built-in Catalyst primitives so every one of them stays inside
  * whole-stage codegen and gets partial aggregation for free:
  *
  *  - [[windowedCounts]]: tumbling event-time window aggregation
  *    (`functions.window` — the batch form of the Structured Streaming
  *    windowed agg; EventOpsSpec asserts batch/stream parity under a
  *    watermark);
  *  - [[sessions]]: gap-based sessionization via relational window
  *    functions (two-phase (user, time-chunk) form — see [[sessionize]]),
  *    the DataFrame form of `session_window`;
  *  - [[userSessionStats]]: per-user session rollup.
  *
  * Scale notes: windowedCounts shuffles once on its natural key; sessionize
  * partitions its heavy sort by (user, time-chunk) so a bot user's history
  * never serializes one task (the boundary merge runs over per-chunk
  * summaries, not events); no driver-side state anywhere.
  */
object EventOps {

  /** tumbling 1-hour event-time windows per event type. */
  def windowedCounts(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        round(sum(col("value")), 6).as("sum_value"))
      .select(
        col("window.start").as("win_start"),
        col("event_type"), col("n"), col("sum_value"))

  /** gap-based sessionization: a new session starts when a user is idle
    * longer than `gapMinutes`. Emits one row per event with its session id
    * (user_id, session_seq).
    *
    * TWO-PHASE, bot-skew-safe (VERDICT r4 #8): the obvious single
    * `Window.partitionBy(user)` form serializes each user's ENTIRE history
    * into one task's sort — a single bot user with 10⁸ events pins one task
    * at 100× scale while every other core drains. Instead:
    *
    *  1. the heavy pass partitions by (user, time-chunk of `chunkHours`):
    *     per-chunk local session seqs + the chunk's first/last timestamp —
    *     a bot's events now spread across its active chunks, and the
    *     residual skew unit is events-per-(user, chunk), tunable via
    *     `chunkHours`;
    *  2. a per-user pass over CHUNK SUMMARIES (≤ one row per active chunk,
    *     never per event) decides whether each chunk's first local session
    *     bridges the previous chunk's last session (actual gap vs the
    *     threshold — correct across empty chunks) and prefix-sums the
    *     global session offset: global_seq = offset + local_seq − bridge.
    *
    * Output is event-for-event IDENTICAL to the single-window form
    * (EventOpsSpec: real table + planted bot + chunk-boundary cases);
    * the driver oracle (`events_sessions`) gates it against DuckDB's own
    * single-window SQL. */
  def sessionize(events: DataFrame, gapMinutes: Int = 30, chunkHours: Int = 24): DataFrame =
    sessionizeFrom(sessionizeLocal(events, gapMinutes, chunkHours).localCheckpoint(),
      gapMinutes)

  /** the heavy per-event phase of [[sessionize]] BEFORE materialization —
    * exposed so EventOpsSpec can assert the (user, chunk) partitioning of
    * the heavy window on the un-truncated plan (sessionize itself
    * localCheckpoints this frame: it feeds both the summary aggregate and
    * the final join, and without materialization the wide window
    * shuffle+sort executes twice — no ReusedExchange across the two
    * specialized consumer subplans). */
  private[graft] def sessionizeLocal(events: DataFrame, gapMinutes: Int = 30,
      chunkHours: Int = 24): DataFrame = {
    val gapUs = gapMinutes * 60000000L
    val chunkUs = chunkHours * 3600000000L
    // every internal column is __sess_-prefixed: withColumn CLOBBERS an
    // existing column of the same name, so plain names like `chunk` or
    // `offset` (plausible event-log fields) would silently overwrite and
    // then drop caller data
    // exact microsecond arithmetic (oracle parity: DuckDB epoch_us); a
    // seconds cast would floor-truncate and disagree at gap boundaries. The
    // timestamp cast handles TIMESTAMP_NTZ sources (UTC session timezone).
    val ev = events
      .withColumn("__sess_us", unix_micros(col("ts").cast("timestamp")))
      // integer `div`, not float division: us values near 2^60 would round
      // in a double and could mis-chunk a boundary event
      .withColumn("__sess_chunk", expr(s"__sess_us div $chunkUs"))
    val byChunk = Window.partitionBy(col("user_id"), col("__sess_chunk"))
      .orderBy(col("ts"), col("event_id"))
    val local = ev
      .withColumn("__sess_prev_us", lag(col("__sess_us"), 1).over(byChunk))
      .withColumn("__sess_new",
        when(col("__sess_prev_us").isNull ||
          col("__sess_us") - col("__sess_prev_us") > gapUs, 1L)
          .otherwise(0L))
      .withColumn("__sess_local", sum(col("__sess_new")).over(byChunk))
    local
  }

  /** phase 2 of [[sessionize]] over the (materialized) per-event frame. */
  private def sessionizeFrom(local: DataFrame, gapMinutes: Int): DataFrame = {
    val gapUs = gapMinutes * 60000000L
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("__sess_chunk"))
    val offsets = local.groupBy(col("user_id"), col("__sess_chunk"))
      .agg(min(col("__sess_us")).as("__sess_first_us"),
        max(col("__sess_us")).as("__sess_last_us"),
        max(col("__sess_local")).as("__sess_k"))
      .withColumn("__sess_prev_last", lag(col("__sess_last_us"), 1).over(byUser))
      .withColumn("__sess_bridge",
        when(col("__sess_prev_last").isNotNull &&
          col("__sess_first_us") - col("__sess_prev_last") <= gapUs, 1L)
          .otherwise(0L))
      // sessions completed strictly before this chunk: Σ (k − bridge) over
      // earlier chunks; chunk c's events then number offset+1 … offset+k−bridge
      .withColumn("__sess_offset", coalesce(
        sum(col("__sess_k") - col("__sess_bridge"))
          .over(byUser.rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .select(col("user_id"), col("__sess_chunk"), col("__sess_bridge"),
        col("__sess_offset"))
    local
      .join(offsets, Seq("user_id", "__sess_chunk"))
      .withColumn("session_seq",
        col("__sess_offset") + col("__sess_local") - col("__sess_bridge"))
      .drop("__sess_us", "__sess_chunk", "__sess_prev_us", "__sess_new",
        "__sess_local", "__sess_bridge", "__sess_offset")
  }

  /** the single-window formulation — the spec's equivalence baseline for
    * [[sessionize]] (kept non-shipped: one task sorts a user's whole
    * history, the exact shape a bot user degrades at scale). */
  private[graft] def sessionizeWindowed(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    events
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          unix_micros(col("ts").cast("timestamp")) -
            unix_micros(col("prev_ts").cast("timestamp")) > gapMinutes * 60000000L, 1L)
          .otherwise(0L))
      .withColumn("session_seq", sum(col("new_session")).over(byUser))
      .drop("prev_ts", "new_session")
  }

  /** per-session spans: one row per (user, session). */
  def sessions(events: DataFrame, gapMinutes: Int = 30): DataFrame =
    sessionize(events, gapMinutes)
      .groupBy(col("user_id"), col("session_seq"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"))

  /** per-user rollup over sessions. */
  def userSessionStats(events: DataFrame, gapMinutes: Int = 30): DataFrame =
    sessions(events, gapMinutes)
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_sessions"),
        sum(col("n_events")).as("n_events"),
        max(col("n_events")).as("max_session_events"),
        round(avg(col("n_events")), 6).as("avg_session_events"))
}
