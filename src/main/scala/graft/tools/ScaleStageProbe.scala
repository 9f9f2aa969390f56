package graft.tools

import org.apache.spark.sql.functions._
import graft.{Bench}
import graft.data.SyntheticImages
import graft.pipeline.Dedup
import graft.spark.{functions => gf}

/** dev tool: per-stage wall times of the e2e pipeline on the LITE corpora
  * at data-scaled partitions, to locate the stage behind the sf1
  * super-linear blowup seen in the first ScaleBench linearity run.
  * Args: sf names (default: sf0.1 sf1). */
object ScaleStageProbe {
  def main(args: Array[String]): Unit = {
    val sfs = if (args.nonEmpty) args.toSeq else Seq("sf0.1", "sf1")
    for (sf <- sfs) {
      val parts = sf match { case "sf1" => 320; case "sf0.3" => 96; case _ => 32 }
      val s = Bench.session(32, partitions = parts)
      s.sparkContext.setLogLevel("WARN")
      val corpus = SyntheticImages.ensureLite(s, s"/root/testdata/$sf")
      val rows = corpus.count()
      def t(name: String)(f: => Unit): Double = {
        val t0 = System.nanoTime()
        f
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"PROBE sf=$sf rows=$rows $name%-18s $dt%8.2f s  ${dt * 1e6 / rows}%6.3f us/row")
        dt
      }
      t("scan_count") { corpus.count() }
      t("signatures") {
        Dedup.signatures(corpus)
          .agg(avg(element_at(col("minhash"), 1).cast("double"))).head()
      }
      val cfg = Dedup.defaultConfig
      val sigs = Dedup.signatures(corpus)
        .select(col("image_id"), col("phash"), col("simhash"),
          gf.band_keys(col("minhash"), cfg.bands, cfg.rowsPerBand).as("bands"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      t("sigs_persist") { sigs.count() }
      var cand: org.apache.spark.sql.DataFrame = null
      t("candidates_bands") {
        cand = Dedup.candidatesFromBands(sigs, cfg).localCheckpoint()
        cand.count()
      }
      var edges: org.apache.spark.sql.DataFrame = null
      t("confirm") {
        edges = Dedup.confirm(cand, corpus).select("id_a", "id_b").localCheckpoint()
        edges.count()
      }
      var clustered: org.apache.spark.sql.DataFrame = null
      t("clusters") {
        clustered = Dedup.clusters(edges, corpus.select("image_id"))
        clustered.count()
      }
      t("metrics") {
        Dedup.partitionMetrics(clustered).agg(sum("rows")).head()
      }
      sigs.unpersist()
      s.stop()
    }
  }
}
