package graft.events

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Event-time ops: sessionization correctness on crafted fixtures, and
  * batch == streaming (watermarked) parity of the tumbling-window agg. */
class EventOpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def ts(min: Long, sec: Long = 0): Timestamp =
    new Timestamp(1700000000000L + min * 60000L + sec * 1000L)

  private def fixture() = {
    import spark.implicits._
    // user 1: events at 0, 10, 50, 95 min → sessions {0,10}, {50}, {95}
    // user 2: single event → one session
    // boundary: user 3 at 0 and exactly 30min gap → SAME session (> , not >=)
    Seq(
      (1L, ts(0), 1L, "view", 1.0),
      (2L, ts(10), 1L, "click", 2.0),
      (3L, ts(50), 1L, "view", 3.0),
      (4L, ts(95), 1L, "error", 4.0),
      (5L, ts(7), 2L, "view", 5.0),
      (6L, ts(0), 3L, "view", 6.0),
      (7L, ts(30), 3L, "view", 7.0)
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
  }

  test("sessionize: gap rule, boundary inclusive, per-user isolation") {
    val s = EventOps.sessions(fixture(), gapMinutes = 30)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(s === Set((1L, 1L, 2L), (1L, 2L, 1L), (1L, 3L, 1L),
      (2L, 1L, 1L), (3L, 1L, 2L)))
  }

  test("two-phase sessionize == single-window baseline (bot skew, chunk boundaries)") {
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("event_id", "user_id", "session_seq")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // planted bot: ONE user with 20k events over 12 days (streaks of 10-min
    // activity with occasional > gap holes), sessions repeatedly spanning
    // the 24 h chunk boundary; plus normal users, a user active exactly at
    // a chunk boundary with the gap exactly == threshold (same session),
    // and a user with multi-day empty chunks between events
    val botEvents = (0 until 20000).map { i =>
      // every 100 events jump 45 min (new session); else 5 min steps —
      // sessions are 100 events ≈ 8.3 h, so most cross a chunk boundary
      val mins = i.toLong * 5 + (i / 100) * 45
      (100000L + i, ts(mins), 99L, "bot", 0.0)
    }
    val edgeEvents = Seq(
      // user 50: last event of day 0 at 23:45, first of day 1 at 00:15
      // (same session, exactly 30 min -> bridged, boundary inclusive)
      (200001L, ts(23 * 60 + 45), 50L, "view", 1.0),
      (200002L, ts(24 * 60 + 15), 50L, "view", 1.0),
      // user 51: events 3 empty chunks apart (days 0, 4) -> two sessions
      (200003L, ts(10), 51L, "view", 1.0),
      (200004L, ts(4 * 24 * 60), 51L, "view", 1.0),
      // user 52: one session spanning THREE chunks (23:50 d0 ... 00:20 d2
      // via 25-min steps, every inter-event gap < 30 min)
    ) ++ (0 until 60).map(i =>
      (200100L + i, ts(23 * 60 + 50 + i * 25L), 52L, "view", 1.0))
    val df = spark.createDataset(botEvents ++ edgeEvents)
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .repartition(4)
    assert(canon(EventOps.sessionize(df)) === canon(EventOps.sessionizeWindowed(df)))
    // small chunks stress the boundary merge (every session spans chunks)
    assert(canon(EventOps.sessionize(df, chunkHours = 1)) ===
      canon(EventOps.sessionizeWindowed(df)))
    // real driver table
    val real = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    assert(canon(EventOps.sessionize(real)) === canon(EventOps.sessionizeWindowed(real)))
    // the HEAVY (per-event) window must partition by (user, chunk) — the
    // skew-safety property itself, asserted on the plan. Anchor on the full
    // spec `partitionBy(user_id, chunk) orderBy(ts, ...)`: the light
    // summary window (partitionBy(user_id) orderBy(chunk)) ALSO prints
    // "user_id#…, chunk#…" (its order column follows the partition list),
    // so requiring `, ts#` right after the chunk token — with no ASC
    // between, i.e. chunk is a PARTITION column — is what distinguishes
    // the heavy window from the summary one.
    // the plan is asserted on the PRE-checkpoint heavy phase (sessionize
    // itself materializes it, truncating the visible plan to a LogicalRDD)
    val plan = EventOps.sessionizeLocal(df).queryExecution.optimizedPlan.toString
    assert(plan.contains("windowspecdefinition(user_id"), plan.take(500))
    assert(
      "windowspecdefinition\\(user_id#\\d+L?, __sess_chunk#\\d+L?, ts#".r
        .findFirstIn(plan).nonEmpty,
      s"no (user_id, chunk)-partitioned ts-ordered window in plan:\n${plan.take(1500)}")
  }

  test("userSessionStats rollup") {
    val m = EventOps.userSessionStats(fixture(), gapMinutes = 30)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(m(1L) === ((3L, 4L, 2L)))
    assert(m(2L) === ((1L, 1L, 1L)))
    assert(m(3L) === ((1L, 2L, 2L)))
  }

  test("windowed counts: batch == streaming with watermark") {
    // watermarks require TIMESTAMP (with zone); the parquet ts is NTZ —
    // cast both sides identically (UTC session) so results compare equal
    val events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .withColumn("ts", col("ts").cast("timestamp"))
    val batch = EventOps.windowedCounts(events)
      .collect().map(r => (r.get(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet

    val srcDir = java.nio.file.Files.createTempDirectory("events-src").toString
    val outDir = java.nio.file.Files.createTempDirectory("events-out").toString
    // micro-batches in event-time order (mtime-staged; see StreamFixtures),
    // so the watermark only drops data a production stream would also
    // consider late
    graft.streaming.StreamFixtures.writeTimeOrdered(events, "ts", srcDir, 6)
    val stream = spark.readStream.schema(spark.read.parquet(srcDir).schema)
      .option("maxFilesPerTrigger", "2").parquet(srcDir)
    // watermark bounds state; complete-on-finish via processAllAvailable
    val q = EventOps.windowedCounts(stream.withWatermark("ts", "2 hours"))
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", s"$outDir/ckpt")
      .format("parquet")
      .option("path", s"$outDir/data")
      .start()
    q.processAllAvailable()
    q.stop()
    // append mode only emits windows the watermark has closed; the final
    // (open) windows are legitimately withheld — assert everything emitted
    // matches batch exactly and that most windows closed
    val got = spark.read.parquet(s"$outDir/data")
      .collect().map(r => (r.get(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    assert(got.subsetOf(batch), s"streamed windows disagree with batch: ${(got -- batch).take(3)}")
    assert(got.size >= batch.size / 2, s"too few closed windows: ${got.size} of ${batch.size}")
  }
}
