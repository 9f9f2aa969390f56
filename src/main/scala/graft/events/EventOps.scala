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
  *    functions (`lag` + running sum over `Window.partitionBy(user)`), the
  *    DataFrame form of `session_window`;
  *  - [[userSessionStats]]: per-user session rollup.
  *
  * Scale notes: both ops shuffle once on their natural key (window/user) —
  * the sessionize window sort is per-user and AQE-splittable; no
  * driver-side state anywhere.
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
    * (user_id, session_seq). */
  def sessionize(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    events
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      // exact microsecond gap (oracle parity: DuckDB epoch_us); a seconds
      // cast would floor-truncate and disagree at window boundaries
      // the cast handles TIMESTAMP_NTZ sources (unix_micros wants TIMESTAMP;
      // sessions run with a UTC session timezone so the cast is stable)
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
