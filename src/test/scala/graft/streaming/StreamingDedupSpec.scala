package graft.streaming

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.data.SyntheticImages
import graft.pipeline.Dedup

/** Incremental streaming dedup == batch dedup on the same corpus (the
  * incremental LSH index must find every pair the batch MinHash channel
  * finds, across micro-batch boundaries). */
class StreamingDedupSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("streaming incremental dedup matches batch minhash channel") {
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val corpus = spark.createDataset(
      (0L until 250L).flatMap(fid => SyntheticImages.family(fid, 42L, fid * 8))).toDF()
    val srcDir = java.nio.file.Files.createTempDirectory("stream-src").toString
    val outDir = java.nio.file.Files.createTempDirectory("stream-out").toString
    // 10 input files → several micro-batches (maxFilesPerTrigger=4)
    corpus.repartition(10).write.mode("overwrite").parquet(srcDir)

    val q = StreamingDedup.start(spark, srcDir, outDir)
    q.processAllAvailable()
    q.stop()

    val got = spark.read.parquet(s"$outDir/dup_pairs")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    val batch = Dedup.confirm(Dedup.candidatesMinhash(Dedup.signatures(corpus)), corpus)
      .select("id_a", "id_b")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(batch.nonEmpty)
    // incremental must be a superset-free exact match on the confirm
    // predicate: every streamed pair satisfies the predicate (subset) and
    // band-collision coverage across batches keeps recall ≥ 0.99
    assert(got.subsetOf(batch) || (got -- batch).isEmpty, s"extra pairs: ${(got -- batch).take(5)}")
    val recall = got.intersect(batch).size.toDouble / batch.size
    assert(recall >= 0.99, s"streaming recall $recall (${got.size} vs ${batch.size})")

    // the index is hash-partitioned by band-key bucket on disk, and a
    // bucket-set filter (what every micro-batch pushes) prunes to partition
    // directories — the plan carries it as a PartitionFilter, not a data
    // filter over a full scan
    import org.apache.spark.sql.functions.col
    val bucketDirs = new java.io.File(s"$outDir/index").listFiles()
      .count(_.getName.startsWith("bucket="))
    assert(bucketDirs > 32, s"index has only $bucketDirs bucket partitions")
    val pruned = spark.read.parquet(s"$outDir/index")
      .where(col("bucket").isInCollection(Seq(0, 1, 2, 3)))
    val planStr = pruned.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*bucket".r.findFirstIn(planStr).nonEmpty,
      s"no partition filter on bucket in plan:\n${planStr.take(800)}")
  }
}
