package graft.tools

import org.apache.spark.sql.SparkSession
import graft.ckpt.{ResumablePipeline, SnapshotStore}
import graft.data.SyntheticImages
import graft.pipeline.Dedup

/** Kill-and-resume probe (SURVEY §5.2-6): runs the resumable pipeline's
  * first two stages against the deterministic probe corpus, scribbles an
  * UNCOMMITTED half-written clusters data dir (no manifest), then dies
  * abruptly via `Runtime.halt` — no JVM shutdown hooks, no Spark cleanup,
  * the moral equivalent of `kill -9` after snapshot 2. SnapshotSpec spawns
  * this as a real subprocess and then resumes in a fresh session, asserting
  * byte-identical final clusters vs an uninterrupted run. */
object ResumeProbe {

  /** deterministic corpus shared with SnapshotSpec (families 0..299). */
  def probeCorpus(spark: SparkSession): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    spark.createDataset(
      (0L until 300L).flatMap(fid => SyntheticImages.family(fid, 42L, fid * 8))).toDF()
  }

  def main(args: Array[String]): Unit = {
    val root = args(0)
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val corpus = probeCorpus(spark).cache()
    val cfg = Dedup.defaultConfig
    val store = new SnapshotStore(root, SnapshotStore.hashConfig(cfg))
    store.stage(spark, "signatures", None, "image_id") {
      Dedup.signatures(corpus, cfg)
    }
    store.stage(spark, "edges", Some("signatures"), "id_a") {
      Dedup.confirm(Dedup.candidatesPhashBlocks(corpus, cfg), corpus, cfg)
        .select("id_a", "id_b")
    }
    // half-written third stage: data without a manifest must be IGNORED and
    // overwritten by the resume (a crash mid-stage leaves exactly this)
    corpus.select("image_id").limit(7)
      .write.mode("overwrite").parquet(s"$root/clusters/data")
    System.out.println("PROBE_COMMITTED_TWO")
    System.out.flush()
    Runtime.getRuntime.halt(137)
  }
}
