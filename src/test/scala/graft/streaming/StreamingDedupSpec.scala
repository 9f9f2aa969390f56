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

  test("~20 micro-batches: per-bucket index file count stays bounded, pair set unchanged") {
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val corpus = spark.createDataset(
      (0L until 250L).flatMap(fid => SyntheticImages.family(fid, 42L, fid * 8))).toDF()
    val srcDir = java.nio.file.Files.createTempDirectory("stream-cpt-src").toString
    val outDir = java.nio.file.Files.createTempDirectory("stream-cpt-out").toString
    // 80 input files → 20 micro-batches (maxFilesPerTrigger=4): without
    // compaction, hot buckets accumulate ~20×(files/batch) parquet files
    corpus.repartition(80).write.mode("overwrite").parquet(srcDir)

    val q = StreamingDedup.start(spark, srcDir, outDir)
    q.processAllAvailable()
    q.stop()

    // bounded: any bucket past CompactAfterFiles is rewritten right after
    // the append that grew it, so no bucket ever ends above the threshold
    val bucketDirs = new java.io.File(s"$outDir/index").listFiles()
      .filter(_.getName.startsWith("bucket="))
    assert(bucketDirs.nonEmpty)
    val counts = bucketDirs.map(d => d.getName ->
      d.listFiles().count(f => f.getName.endsWith(".parquet")))
    val worst = counts.maxBy(_._2)
    assert(worst._2 <= StreamingDedup.CompactAfterFiles,
      s"bucket ${worst._1} has ${worst._2} files after compaction")

    // the TOTAL listing is bounded too, not just the *.parquet view:
    // compaction must delete each input's Hadoop .crc sibling (an orphaned
    // checksum per compacted file would re-grow exactly the listing cost
    // compaction bounds) and leave no stale .compact-* tmp dirs behind
    for (d <- bucketDirs) {
      val all = d.listFiles()
      val crcs = all.count(_.getName.endsWith(".crc"))
      val parquets = all.count(_.getName.endsWith(".parquet"))
      assert(crcs <= parquets,
        s"bucket ${d.getName}: $crcs orphan .crc files beside $parquets parquet files")
    }
    assert(!new java.io.File(s"$outDir/index").listFiles()
      .exists(f => f.isDirectory && f.getName.startsWith(".compact-")),
      "stale .compact-* tmp dir left in the index root")

    // lossless: compaction must not drop index rows — one row per (id, band)
    val indexRows = spark.read.parquet(s"$outDir/index").count()
    assert(indexRows === corpus.count() * Dedup.defaultConfig.bands,
      "index row count != rows × bands: compaction lost or duplicated rows")

    // exactly-once pairs sink contract: batchId-keyed partitions (so a
    // crash-replayed micro-batch overwrites its own output) and no
    // duplicate pair rows anywhere in the sink
    val sink = spark.read.parquet(s"$outDir/dup_pairs")
    assert(sink.columns.contains("batch"), "pairs sink is not batchId-partitioned")
    assert(sink.select("id_a", "id_b").count() ===
      sink.select("id_a", "id_b").distinct().count(),
      "duplicate pair rows in the sink")

    // unchanged output: the streamed pair set still matches the batch channel
    val got = spark.read.parquet(s"$outDir/dup_pairs")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    val batch = Dedup.confirm(Dedup.candidatesMinhash(Dedup.signatures(corpus)), corpus)
      .select("id_a", "id_b")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got.subsetOf(batch), s"extra pairs: ${(got -- batch).take(5)}")
    val recall = got.intersect(batch).size.toDouble / batch.size
    assert(recall >= 0.99, s"streaming recall $recall (${got.size} vs ${batch.size})")
  }

  test("planted hot cluster: salted confirm join keeps the exact pair set") {
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    // one giant duplicate cluster (identical caption + phash ⇒ every band
    // value collides for every member) spread across micro-batches, so each
    // batch's members confirm against an already-populated hot index bucket
    // — the case the salt fan-out exists for. Correctness bar: the streamed
    // pair set must still be EXACTLY the batch channel's pair set, and must
    // contain all C(n,2) planted pairs.
    val hotN = 120
    val cap = (0 until 12).map(i => SyntheticImages.vocab(i * 7)).mkString(" ")
    val hot = (0 until hotN).map { i =>
      SyntheticImages.Row(f"img_${5000000L + i}%010d", Array.empty[Byte], 32, 32,
        "png", cap, 0x0F0F0F0F12345678L, 999999L)
    }
    val bg = (0L until 50L).flatMap(fid => SyntheticImages.family(fid, 7L, fid * 8))
    val corpus = spark.createDataset(hot ++ bg).toDF()
    val srcDir = java.nio.file.Files.createTempDirectory("stream-hot-src").toString
    val outDir = java.nio.file.Files.createTempDirectory("stream-hot-out").toString
    corpus.repartition(8).write.mode("overwrite").parquet(srcDir)

    val q = StreamingDedup.start(spark, srcDir, outDir)
    q.processAllAvailable()
    q.stop()

    val got = spark.read.parquet(s"$outDir/dup_pairs")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    val batch = Dedup.confirm(Dedup.candidatesMinhash(Dedup.signatures(corpus)), corpus)
      .select("id_a", "id_b")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    val hotIds = hot.map(_.image_id).sorted
    val planted = (for {
      i <- hotIds.indices; j <- (i + 1) until hotIds.length
    } yield (hotIds(i), hotIds(j))).toSet
    assert(planted.subsetOf(got), s"missing planted pairs: ${(planted -- got).take(5)}")
    assert(got.subsetOf(batch), s"extra pairs: ${(got -- batch).take(5)}")
    val recall = got.intersect(batch).size.toDouble / batch.size
    assert(recall >= 0.99, s"streaming recall $recall (${got.size} vs ${batch.size})")
  }

  test("legacy flat pairs layout: migrated to batch=-1, replayed pairs not duplicated") {
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val corpus = spark.createDataset(
      (0L until 120L).flatMap(fid => SyntheticImages.family(fid, 42L, fid * 8))).toDF()
    val srcDir = java.nio.file.Files.createTempDirectory("stream-legacy-src").toString
    val outDir = java.nio.file.Files.createTempDirectory("stream-legacy-out").toString
    corpus.repartition(8).write.mode("overwrite").parquet(srcDir)

    // a reference run gives the true pair set
    val refOut = java.nio.file.Files.createTempDirectory("stream-legacy-ref").toString
    val q0 = StreamingDedup.start(spark, srcDir, refOut)
    q0.processAllAvailable(); q0.stop()
    val truth = spark.read.parquet(s"$refOut/dup_pairs").select("id_a", "id_b")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(truth.nonEmpty)

    // simulate the OLD layout's crash artifact: a subset of the true pairs
    // sits as FLAT parquet files directly in dup_pairs (written by the old
    // appending sink before the crash), with no batch= partitioning
    val legacySubset = truth.take(math.max(1, truth.size / 2)).toSeq
    legacySubset.toDF("id_a", "id_b").coalesce(1)
      .write.mode("overwrite").parquet(s"$outDir/dup_pairs")

    // fresh stream over the same source: migration moves the flat files to
    // batch=-1, and the per-batch anti-join suppresses the re-emission of
    // every legacy pair — the union read must equal the truth with NO
    // duplicates (the old behavior double-counted the replayed tail batch)
    val q = StreamingDedup.start(spark, srcDir, outDir)
    q.processAllAvailable(); q.stop()
    val sink = spark.read.parquet(s"$outDir/dup_pairs")
    assert(sink.columns.contains("batch"))
    assert(sink.where(org.apache.spark.sql.functions.col("batch") === -1).count()
      === legacySubset.size.toLong)
    val all = sink.select("id_a", "id_b")
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(all.length === all.distinct.length,
      "legacy pairs duplicated across batch=-1 and a replayed batch")
    assert(all.toSet === truth)
  }
}
