package graft.tools

import org.apache.spark.sql.SparkSession

/** dev tool (r6): dump named SparkEntry queries to parquet for offline
  * old-vs-new output equivalence checks. Usage:
  * QueryDump <sfDir> <outDir> <query>[,<query>...] */
object QueryDump {
  def main(args: Array[String]): Unit = {
    graft.Bench.sweepStaleLocalDirs()
    val Array(sfDir, outDir, names) = args.take(3)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.local.dir", "/dev/shm/spark-graft")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (name <- names.split(',')) {
      graft.SparkEntry.queries(name)(spark, sfDir)
        .write.mode("overwrite").parquet(s"$outDir/$name")
      println(s"QUERYDUMP wrote $outDir/$name")
    }
    spark.stop()
  }
}
