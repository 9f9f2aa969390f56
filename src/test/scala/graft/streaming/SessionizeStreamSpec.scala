package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.events.EventOps

/** flatMapGroupsWithState sessionization must agree with the batch
  * window-function sessionization on closed sessions. */
class SessionizeStreamSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("streaming sessionization matches batch on closed sessions") {
    spark.sparkContext.setLogLevel("WARN")
    val events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .withColumn("ts", col("ts").cast("timestamp"))
    val batch = EventOps.sessions(events, gapMinutes = 30)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getTimestamp(3), r.getTimestamp(4))).toSet

    val srcDir = java.nio.file.Files.createTempDirectory("sess-src").toString
    val outDir = java.nio.file.Files.createTempDirectory("sess-out").toString
    StreamFixtures.writeTimeOrdered(events, "ts", srcDir, 8)
    val stream = spark.readStream.schema(
        spark.read.parquet(srcDir).schema)
      .option("maxFilesPerTrigger", "2").parquet(srcDir)
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", "1 minute")
    val q = SessionizeStream.sessions(stream, gapMinutes = 30)
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", s"$outDir/ckpt")
      .format("parquet")
      .option("path", s"$outDir/data")
      .start()
    q.processAllAvailable()
    q.stop()

    val got = spark.read.parquet(s"$outDir/data")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getTimestamp(3), r.getTimestamp(4))).toSet
    // the stream emits exactly the batch sessions, minus any still open at
    // end-of-stream (their timeout never fires once input stops)
    assert(got.subsetOf(batch),
      s"stream emitted sessions batch does not have: ${(got -- batch).take(3)}")
    assert(got.size >= batch.size - 60,
      s"too many unclosed sessions: ${got.size} of ${batch.size}")
    assert(got.nonEmpty)
  }
}
