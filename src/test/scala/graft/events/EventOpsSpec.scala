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
