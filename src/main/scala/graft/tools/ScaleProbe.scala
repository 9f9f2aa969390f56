package graft.tools

import org.apache.spark.sql.SparkSession
import graft.data.SyntheticImages
import graft.pipeline.Dedup

/** dev tool: A/B shuffle/codec configs on the end-to-end sketch→cluster
  * pipeline (the Bench scaling job) at several core counts, to chase the
  * 8→32-core efficiency cliff. Knobs via env:
  *   SPARK_GRAFT_CODEC            io compression codec (lz4|zstd|snappy)
  *   SPARK_GRAFT_SHUFFLE_COMPRESS true|false
  *   SPARK_GRAFT_RUNS             runs per level (default 3)
  * Args: core counts (default "8 32"). */
object ScaleProbe {

  private def session(cpus: Int): SparkSession = {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val b = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.local.dir", "/dev/shm/spark-graft")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)
      .config("spark.ui.enabled", "false")
    sys.env.get("SPARK_GRAFT_CODEC").foreach(c => b.config("spark.io.compression.codec", c))
    sys.env.get("SPARK_GRAFT_SHUFFLE_COMPRESS").foreach(v => b.config("spark.shuffle.compress", v))
    b.getOrCreate()
  }

  /** same job as Bench.pipelineE2E. */
  private def e2e(spark: SparkSession, sfDir: String): Long = {
    import org.apache.spark.sql.functions.col
    import graft.spark.{functions => gf}
    val corpus = SyntheticImages.ensure(spark, sfDir)
    val cfg = Dedup.defaultConfig
    val sigs = Dedup.signatures(corpus)
      .select(col("image_id"), col("phash"), col("simhash"),
        gf.band_keys(col("minhash"), cfg.bands, cfg.rowsPerBand).as("bands"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val edges = Dedup.confirm(Dedup.candidatesFromBands(sigs, cfg), corpus).select("id_a", "id_b")
      val clustered = Dedup.clusters(edges, corpus.select("image_id"))
      Dedup.partitionMetrics(clustered).agg(org.apache.spark.sql.functions.sum("rows"))
        .head().getLong(0)
    } finally sigs.unpersist()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val runs = sys.env.getOrElse("SPARK_GRAFT_RUNS", "3").toInt
    val cpuList = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(8, 32)
    val tag = s"codec=${sys.env.getOrElse("SPARK_GRAFT_CODEC", "lz4")} " +
      s"shuffleCompress=${sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_COMPRESS", "true")}"
    // warmup + corpus materialization
    val w = session(32); w.sparkContext.setLogLevel("WARN")
    SyntheticImages.ensure(w, sfDir).count()
    e2e(w, "/root/testdata/sf0.001")
    w.stop()
    val results = cpuList.map { cpus =>
      val times = (1 to runs).map { _ =>
        val s = session(cpus); s.sparkContext.setLogLevel("WARN")
        val t0 = System.nanoTime()
        e2e(s, sfDir)
        val dt = (System.nanoTime() - t0) / 1e9
        s.stop()
        dt
      }
      println(f"SCALE $tag cpus=$cpus%2d runs=${times.map(x => f"$x%6.2f").mkString(" ")} min=${times.min}%6.2f")
      cpus -> times.min
    }.toMap
    for {
      a <- cpuList; b <- cpuList if b == a * 4
    } println(f"SCALE $tag eff ${a}->$b = ${(results(a) / results(b)) / 4.0}%.3f")
  }
}
