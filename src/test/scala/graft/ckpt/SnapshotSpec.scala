package graft.ckpt

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.data.SyntheticImages
import graft.pipeline.Dedup

/** FIXTURES.md §F4: kill-after-snapshot resume must produce identical final
  * clusters and matching per-partition lineage. */
class SnapshotSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  lazy val corpus = {
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    spark.createDataset((0L until 300L).flatMap(fid => SyntheticImages.family(fid, 42L, fid * 8)))
      .toDF().cache()
  }

  private def tmp(): String = java.nio.file.Files.createTempDirectory("snap").toString

  test("fresh run commits all three snapshots with lineage") {
    val root = tmp()
    val out = ResumablePipeline.run(spark, corpus, root)
    assert(out.count() === corpus.count())
    val store = new SnapshotStore(root, SnapshotStore.hashConfig(Dedup.defaultConfig))
    for (st <- Seq("signatures", "edges", "clusters")) {
      assert(store.isCommitted(st), s"$st not committed")
      val m = store.manifestJson(st).get
      assert(m.contains("\"partitions\":[") && m.contains("\"rows\":"), m.take(100))
    }
  }

  test("kill-after-edges resume: identical final clusters, stages reused") {
    val rootA = tmp()
    val storeA = new SnapshotStore(rootA, SnapshotStore.hashConfig(Dedup.defaultConfig))
    // simulate partial run: only signatures + edges committed, then "crash"
    storeA.commit(Dedup.signatures(corpus), "signatures", None, "image_id")
    storeA.commit(
      Dedup.confirm(Dedup.candidatesPhashBlocks(corpus), corpus).select("id_a", "id_b"),
      "edges", Some("signatures"), "id_a")
    assert(!storeA.isCommitted("clusters"))
    val edgesManifestBefore = storeA.manifestJson("edges").get

    // resume from the same root: must reuse both snapshots (manifest byte-identical)
    val resumed = ResumablePipeline.run(spark, corpus, rootA)
    assert(storeA.manifestJson("edges").get === edgesManifestBefore,
      "edges snapshot was recomputed on resume")

    // fresh full run in a different root → identical final clusters
    val fresh = ResumablePipeline.run(spark, corpus, tmp())
    val a = resumed.orderBy("image_id").collect().map(r => (r.getString(0), r.getString(1)))
    val b = fresh.orderBy("image_id").collect().map(r => (r.getString(0), r.getString(1)))
    assert(a.toSeq === b.toSeq)
  }

  test("config change invalidates snapshots (no cross-config reuse)") {
    val root = tmp()
    ResumablePipeline.run(spark, corpus, root)
    val other = Dedup.Config(hammingThreshold = 2)
    val store = new SnapshotStore(root, SnapshotStore.hashConfig(other))
    assert(!store.isCommitted("signatures"))
  }
}
