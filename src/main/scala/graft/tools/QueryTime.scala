package graft.tools

import org.apache.spark.sql.SparkSession

/** dev tool: time named SparkEntry queries with the Bench headline protocol
  * (fresh session per query, sf0.001 JIT warmup, warm best-of-N walls) so a
  * code-vs-code claim can be made by running two builds back-to-back in the
  * same host window. Not part of the driver contract.
  *
  * usage: QueryTime <query>[,<query>...] [runs]   (env SPARK_GRAFT_SF_DIR,
  * SPARK_GRAFT_CPUS as in graft.Bench)
  */
object QueryTime {
  def main(args: Array[String]): Unit = {
    graft.Bench.sweepStaleLocalDirs()
    val names = args.headOption.map(_.split(',').toSeq)
      .getOrElse(Seq("dup_pairs"))
    val runs = if (args.length > 1) args(1).toInt else 2
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")
    def session(): SparkSession = {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      SparkSession.builder().master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus.toString)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.local.dir", "/dev/shm/spark-graft")
        .config("spark.sql.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    }
    for (name <- names) {
      val fn = graft.SparkEntry.queries(name)
      val s = session()
      s.sparkContext.setLogLevel("WARN")
      // a failed warmup must be VISIBLE: silently skipping it folds
      // JIT/classload cost into the first "warm" wall and skews the
      // code-vs-code comparison this tool exists to make
      try { fn(s, warmDir).count(): Unit } catch {
        case t: Throwable => println(
          s"QUERYTIME $name WARMUP FAILED ($warmDir): ${t.getClass.getName}: " +
            s"${t.getMessage} — first wall below includes JIT/classload cost")
      }
      val walls = (1 to runs).map { i =>
        val t0 = System.nanoTime()
        fn(s, sfDir).count()
        val w = (System.nanoTime() - t0) / 1e9
        println(f"QUERYTIME $name run$i $w%.3f s")
        w
      }
      s.stop()
      println(f"QUERYTIME $name best ${walls.min}%.3f s of $runs")
    }
  }
}
