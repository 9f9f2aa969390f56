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
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    }
    // warmup
    val w = session(32); w.sparkContext.setLogLevel("WARN")
    val _ = { val c = SyntheticImages.ensure(w, "/root/testdata/sf0.001")
      Dedup.clusters(Dedup.dupPairs(c), c.select("image_id")).count() }
    w.stop()

    for (cpus <- Seq(8, 32)) {
      val s = session(cpus); s.sparkContext.setLogLevel("WARN")
      val corpus = SyntheticImages.ensure(s, sfDir)
      def t(name: String)(f: => Long): Unit = {
        val t0 = System.nanoTime()
        val n = f
        println(f"PROBE cpus=$cpus $name%-22s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
      }
      t("scan_count") { corpus.count() }
      t("signatures") { Dedup.signatures(corpus).agg(sum(crc32(col("minhash").cast("string")))).count(); Dedup.signatures(corpus).count() }
      t("candidates") { Dedup.candidatesPhashBlocks(corpus).count() }
      val cand = Dedup.candidatesPhashBlocks(corpus)
      t("confirm") { Dedup.confirm(cand, corpus).count() }
      val edges = Dedup.dupPairs(corpus)
      t("clusters") { Dedup.clusters(edges, corpus.select("image_id")).count() }
      s.stop()
    }
  }
}
