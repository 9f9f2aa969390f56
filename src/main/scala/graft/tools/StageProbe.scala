package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.data.SyntheticImages
import graft.pipeline.Dedup

/** dev tool: per-stage wall times of the e2e pipeline at two parallelism
  * levels, to locate non-scaling stages. Not part of the driver contract. */
object StageProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def session(cpus: Int): SparkSession = {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      SparkSession.builder().master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus.toString)
        .config("spark.sql.adaptive.enabled", "true")
      .config("spark.local.dir", "/dev/shm/spark-graft") // shuffle to tmpfs: stable measurements, no disk variance
      .config("spark.sql.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    }
    // warmup
    val w = session(32); w.sparkContext.setLogLevel("WARN")
    val _ = { val c = SyntheticImages.ensure(w, "/root/testdata/sf0.001")
      Dedup.clusters(Dedup.dupPairs(c), c.select("image_id")).count() }
    w.stop()

    val cpuList = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(8, 32)
    for (cpus <- cpuList) {
      val s = session(cpus); s.sparkContext.setLogLevel("WARN")
      val corpus = SyntheticImages.ensure(s, sfDir)
      def t(name: String)(f: => Long): Unit = {
        val times = (1 to 3).map { _ =>
          val t0 = System.nanoTime()
          f
          (System.nanoTime() - t0) / 1e9
        }
        println(f"PROBE cpus=$cpus $name%-22s ${times.map(x => f"$x%7.2f").mkString(" ")} s")
      }
      t("scan_count") { corpus.count() }
      t("signatures") { Dedup.signatures(corpus)
        .agg(avg(element_at(col("minhash"), 1).cast("double"))).head(); 636381L }
      val cand = Dedup.candidatesPhashBlocks(corpus).localCheckpoint()
      t("candidates") { Dedup.candidatesPhashBlocks(corpus).count() }
      val sigsDf = Dedup.signatures(corpus).localCheckpoint()
      t("mh_candidates") { Dedup.candidatesMinhash(sigsDf).count() }
      t("mh_cand_nockpt") { Dedup.candidatesMinhash(Dedup.signatures(corpus)).count() }
      val edges = Dedup.confirm(cand, corpus).select("id_a", "id_b").localCheckpoint()
      t("confirm_only") { Dedup.confirm(cand, corpus).select("id_a", "id_b").count() }
      t("clusters_only") { Dedup.clusters(edges, corpus.select("image_id")).count() }
      s.stop()
    }
  }
}
