package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.pipeline.Dedup
import graft.spark.{functions => gf}

/** Incremental (streaming) near-duplicate detection.
  *
  * The reference is batch-only (SURVEY.md §2.5 "Streaming: none"), but a
  * training-data ingest pipeline sees documents/images arrive continuously.
  * This module processes an append-only stream of image+caption rows and
  * maintains a persistent LSH index:
  *
  *  - `readStream` source → the same narrow signature stage as batch
  *    (sketches are row-local, so batch/stream parity is free);
  *  - `foreachBatch`: each micro-batch's band keys are joined against the
  *    accumulated index parquet (new-vs-old) AND self-joined (new-vs-new),
  *    confirmed exactly, appended to a `dup_pairs` sink, then the batch's
  *    keys are appended to the index — the incremental form of the batch
  *    LSH join (new data only ever joins the index, never the full history
  *    re-shuffles).
  *
  * State lives in parquet (restart-safe together with the checkpointLocation
  * offsets), keeping the pattern identical to what an Iceberg-backed index
  * table would do at production scale. foreachBatch delivery is
  * at-least-once, so each sink states its replay contract explicitly: the
  * `dup_pairs` sink is EXACTLY-once (each micro-batch overwrites its own
  * batchId-keyed partition, so a crash-replayed batch rewrites rather than
  * re-appends); the index append is at-least-once by design — replay
  * duplicates are healed by compaction's (id, bv) dedup and can only
  * re-produce already-distinct pairs, never new ones.
  */
object StreamingDedup {

  /** number of band-key hash buckets the persistent index is partitioned
    * by: each micro-batch reads ONLY the index partitions its own band keys
    * hash into (parquet partition pruning), so the per-batch join cost
    * scales with the batch's bucket coverage, not the total index size. A
    * small batch touches few buckets; 256 keeps partition dirs coarse
    * enough that a full-coverage batch still reads 256 files, not 10^5. */
  val IndexBuckets = 256

  /** per-band-value salt fan-out of the confirm joins: the index side is
    * split into this many sub-keys (salt = pmod(id)), the micro-batch side
    * replicated to all of them, so one hot band value occupies SaltChunks
    * tasks instead of one. */
  val SaltChunks = 8

  /** per-bucket file-count compaction threshold: once a bucket directory
    * accumulates more than this many parquet files, its smallest ⌈n/2⌉
    * files are merged into one (size-tiered — see [[compactBucket]]).
    * Without this, long-running ingest appends one file per micro-batch
    * forever, and every later batch that touches the bucket pays
    * ever-growing listing + open cost. */
  val CompactAfterFiles = 8

  private def bucketDataFiles(dir: java.io.File): Array[java.io.File] =
    Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.endsWith(".parquet") &&
        !f.getName.startsWith(".") && !f.getName.startsWith("_"))

  // depth-first, symlink-safe recursive delete (File.delete refuses
  // non-empty dirs — a crash mid-write leaves nested `_temporary/...`
  // trees in the tmp dir); shared with Bench's tmpfs sweep
  private def deleteRecursively(f: java.io.File): Unit =
    graft.util.Fs.deleteRecursively(f)

  /** delete a data file TOGETHER with the `.name.crc` sibling the local
    * Hadoop ChecksumFileSystem committed next to it — File.delete bypasses
    * Hadoop, and an orphaned .crc per compacted input would otherwise grow
    * the bucket listing forever (the exact cost compaction bounds). */
  private def deleteWithCrc(f: java.io.File): Boolean = {
    val ok = f.delete()
    if (ok) new java.io.File(f.getParentFile, s".${f.getName}.crc").delete(): Unit
    ok
  }

  /** sweep tmp dirs orphaned by a crash mid-compaction. Called ONCE per
    * batch from the single-writer foreachBatch thread, BEFORE the bucket
    * compaction pool starts: any `.compact-*` dir present then is stale
    * (its moved-in files, if any, are already part of its bucket), and no
    * live sibling compaction exists yet to race with. */
  private def sweepStaleCompactionDirs(indexDir: String): Unit =
    Option(new java.io.File(indexDir).listFiles())
      .getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith(".compact-"))
      .foreach(deleteRecursively)

  /** merge one over-threshold bucket's SMALLEST ⌈n/2⌉ files into one —
    * size-tiered, not a full-bucket rewrite. The original policy rewrote
    * the whole bucket to one file each time it crossed the threshold, so a
    * bucket's entire accumulated data was re-read and re-written every
    * compaction — O(N²/K) total write amplification, measured by
    * StreamBench as a per-batch wall that tracks index size. Merging the
    * smallest half keeps the file count ≤ CompactAfterFiles while a row's
    * file roughly doubles each time it participates, so each row is
    * rewritten O(log N) times over an unbounded ingest.
    *
    * Crash-safe WITHOUT a manifest, by write-then-delete ordering: the
    * merged file is fully written and moved into the bucket directory
    * BEFORE any input file is deleted, so a crash at any point leaves the
    * bucket's row multiset a SUPERSET of the true data. Duplicate index
    * rows are harmless to the pair output (each batch's confirm ends in
    * `distinct()`, and ids are unique per row so a duplicated index row can
    * only re-produce the same pair); LOST rows would silently drop pairs —
    * hence this ordering rather than an in-place overwrite. foreachBatch is
    * a single serial writer; concurrent calls for DISTINCT buckets touch
    * disjoint dirs and unique tmp paths. */
  private def compactBucket(spark: SparkSession, indexDir: String, bucket: Int): Unit = {
    val dir = new java.io.File(indexDir, s"bucket=$bucket")
    val all = bucketDataFiles(dir)
    if (all.length <= CompactAfterFiles) return
    // smallest ⌈n/2⌉ files (ties by name for determinism)
    val olds = all.sortBy(f => (f.length(), f.getName))
      .take((all.length + 1) / 2)
    val tmp = new java.io.File(indexDir,
      s".compact-bucket-$bucket-${java.util.UUID.randomUUID()}")
    // read exactly the listed merge set (never the moved-in result).
    // dropDuplicates on the natural key (one index row per id per band
    // value): if an earlier pass's input-file delete failed, its rows exist
    // both in that stuck file and in the merged file — deduping here keeps
    // duplication from COMPOUNDING (a duplicate pair collapses whenever its
    // two holders land in the same merge set, which smallest-half selection
    // eventually forces), while the write-then-delete ordering still
    // guarantees rows are never lost.
    spark.read.parquet(olds.map(_.getPath).toIndexedSeq: _*)
      .dropDuplicates("id", "bv")
      .coalesce(1).write.parquet(tmp.getPath)
    Option(tmp.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.endsWith(".parquet")).foreach { p =>
      // move the DATA file first, the .crc sibling second: a crash between
      // the two moves then leaves the orphan .crc in tmp, where the
      // `.compact-*` sweep at next entry removes it. (The old crc-first
      // order stranded the .crc in the bucket dir — a place no sweep ever
      // touches — whenever the crash hit between the moves.) A data file
      // briefly lacking its .crc is safe: ChecksumFileSystem skips
      // verification when the sibling is absent, and the defensive orphan
      // sweep below clears any .crc that still loses its data file.
      java.nio.file.Files.move(p.toPath,
        new java.io.File(dir, p.getName).toPath,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE): Unit
      val crc = new java.io.File(tmp, s".${p.getName}.crc")
      if (crc.isFile) java.nio.file.Files.move(crc.toPath,
        new java.io.File(dir, crc.getName).toPath,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE): Unit
    }
    // defensive sweep: remove any `.name.crc` whose data file is gone
    // (e.g. left by a crash under the pre-fix move order) so the bucket
    // listing — the exact cost compaction bounds — cannot grow stale
    // checksum entries forever
    Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.startsWith(".") && f.getName.endsWith(".crc"))
      .filterNot(f => new java.io.File(dir,
        f.getName.stripPrefix(".").stripSuffix(".crc")).isFile)
      .foreach(_.delete(): Unit)
    // eager per-file delete (no short-circuit): a failure leaves that file's
    // rows duplicated until a later compaction both dedups and deletes it —
    // bounded, logged, and harmless to pair output (confirm ends in distinct)
    val failed = olds.filterNot(deleteWithCrc)
    if (failed.nonEmpty) System.err.println(
      s"[streaming-dedup] bucket=$bucket: ${failed.length} input file(s) " +
        "could not be deleted after compaction; rows stay duplicated until " +
        "a later compaction pass dedups and removes them")
    deleteRecursively(tmp)
  }

  /** The pairs sink changed layout from flat appended files to `batch=N`
    * partition dirs (the exactly-once overwrite key). A checkpoint resumed
    * from the old layout would mix flat files with partition dirs, which
    * `spark.read.parquet(pairsDir)` cannot read consistently — so at stream
    * start any flat parquet files are moved into a `batch=-1` partition
    * (an id no real micro-batch can claim: batchIds start at 0, so no
    * replay ever overwrites it). Readers see the legacy rows under
    * batch = -1; .crc siblings travel with their data files.
    *
    * Returns true when legacy rows were (or already are) present: the old
    * layout's tail batch may have written its flat pair files before the
    * crash whose checkpoint is now being resumed, so the replayed batch
    * would re-emit pairs that already sit under batch=-1. A pair is
    * emitted by exactly ONE batch in the normal flow (each id arrives
    * once, and a pair surfaces only when its second member arrives), so
    * the caller can anti-join new pairs against batch=-1 without ever
    * dropping a legitimately new pair — restoring exactly-once across the
    * layout migration. */
  private def migrateLegacyFlatPairs(pairsDir: String): Boolean = {
    val dir = new java.io.File(pairsDir)
    val flat = bucketDataFiles(dir)
    if (flat.isEmpty) return new java.io.File(dir, "batch=-1").isDirectory
    val legacy = new java.io.File(dir, "batch=-1")
    legacy.mkdirs()
    flat.foreach { f =>
      java.nio.file.Files.move(f.toPath,
        new java.io.File(legacy, f.getName).toPath,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE): Unit
      val crc = new java.io.File(dir, s".${f.getName}.crc")
      if (crc.isFile) java.nio.file.Files.move(crc.toPath,
        new java.io.File(legacy, crc.getName).toPath,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE): Unit
    }
    // the flat layout's _SUCCESS marker would otherwise sit beside the
    // partition dirs as a zero-length data candidate
    new java.io.File(dir, "_SUCCESS").delete(): Unit
    true
  }

  /** run the incremental pipeline over a parquet-backed stream.
    * Returns the started query; results accumulate under `outDir/dup_pairs`,
    * the LSH index under `outDir/index` (hash-partitioned by band-key
    * bucket). */
  def start(spark: SparkSession, sourceDir: String, outDir: String,
      cfg: Dedup.Config = Dedup.defaultConfig): org.apache.spark.sql.streaming.StreamingQuery = {
    val schema = spark.read.parquet(sourceDir).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "4")
      .parquet(sourceDir)

    val indexDir = s"$outDir/index"
    val pairsDir = s"$outDir/dup_pairs"
    val hasLegacyPairs = migrateLegacyFlatPairs(pairsDir)
    // r6: the batch=-1 legacy pair set is FROZEN once migrated, but the
    // exactly-once anti-join below consumed it per micro-batch — an
    // unbounded ingest re-listed and re-scanned that parquet forever. Read
    // and persist it once at stream start instead; each batch's anti-join
    // then probes cached blocks. (Retiring the anti-join entirely once the
    // replayed tail has passed would need a watermark over re-arriving ids —
    // left as is: the cached probe is cheap and unconditionally safe.)
    val legacyPairs =
      if (!hasLegacyPairs) null
      else spark.read.parquet(s"$pairsDir/batch=-1").select("id_a", "id_b")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    stream.writeStream
      .option("checkpointLocation", s"$outDir/checkpoint")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val sigs = Dedup.signatures(batch, cfg)
        val keyed = sigs.select(
            expr("cast(substring(image_id, 5) as bigint)").as("id"),
            col("phash"),
            explode(gf.band_keys(col("minhash"), cfg.bands, cfg.rowsPerBand)).as("bv"),
            col("caption"))
          .withColumn("tok", gf.token_ngrams(col("caption"), 1))
          .withColumn("bucket", pmod(col("bv"), lit(IndexBuckets.toLong)).cast("int"))
          .drop("caption")
          .localCheckpoint()

        val haveIndex = new java.io.File(indexDir, "_SUCCESS").exists()
        // the batch's bucket set (bounded: <= IndexBuckets values) — pushed
        // as a PARTITION filter on the index read, and the compaction scope
        // after the append (only touched buckets can have grown)
        val batchBuckets = keyed.select("bucket").distinct()
          .collect().map(_.getInt(0)).toSeq
        // the index read then lists and scans only colliding bucket
        // directories instead of re-shuffling the whole accumulated index
        // every micro-batch
        val oldIndex =
          if (!haveIndex) null
          else spark.read.parquet(indexDir)
            .where(col("bucket").isInCollection(batchBuckets))

        // pair order must be normalized with least/greatest: a NEW row's id
        // can be on either side of an OLD row's id, so `id_a < id_b` on the
        // raw join would drop most cross-batch pairs.
        //
        // SALTED (parity with the batch channel's salt-and-replicate): the
        // right side — the populated index, or the batch itself in the
        // new-vs-new self-join — carries salt = pmod(id, SaltChunks) as an
        // extra join key; the LEFT side (always the micro-batch, bounded by
        // maxFilesPerTrigger) is replicated to every salt. A giant duplicate
        // cluster sharing one band value then fans across SaltChunks tasks
        // instead of serializing one, at the bounded cost of SaltChunks×
        // the small batch side. Each pair still collides exactly once per
        // band value (at the right row's own salt), so the pair set is
        // unchanged (StreamingDedupSpec planted-hot-cluster case).
        def confirmPairs(a: DataFrame, b: DataFrame): DataFrame =
          a.toDF("bv", "ia", "phash_a", "tok_a")
            .withColumn("salt", explode(sequence(lit(0L), lit(SaltChunks - 1L))))
            .join(b.toDF("bv", "ib", "phash_b", "tok_b")
              .withColumn("salt", pmod(col("ib"), lit(SaltChunks.toLong))),
              Seq("bv", "salt"))
            .where(col("ia") =!= col("ib") &&
              bit_count(col("phash_a").bitwiseXOR(col("phash_b"))) <= cfg.hammingThreshold)
            .where(gf.exact_jaccard(col("tok_a"), col("tok_b")) >= cfg.tokenJaccard)
            .select(least(col("ia"), col("ib")).as("id_a"),
              greatest(col("ia"), col("ib")).as("id_b"))
            .distinct()

        val cols = keyed.select("bv", "id", "phash", "tok")
        val newNew = confirmPairs(cols, cols)
        val pairs =
          if (oldIndex != null)
            newNew.union(confirmPairs(cols, oldIndex.select("bv", "id", "phash", "tok")))
              .distinct()
          else newNew
        // IDEMPOTENT pairs sink: foreachBatch is at-least-once — a crash
        // between this write and the streaming checkpoint's offset commit
        // replays the whole micro-batch, and a plain append would then
        // duplicate its pair rows PERMANENTLY (nothing downstream dedups
        // the sink). Keying the output directory on batchId and overwriting
        // makes the replay rewrite its own partition instead: exactly-once
        // pairs. (The index append below stays at-least-once by design —
        // its duplicates are healed by compaction's (id, bv) dedup and can
        // only re-produce already-distinct pairs.) Readers of the sink see
        // `batch` as an extra trailing partition column.
        val pairsOut = pairs
          .select(format_string("img_%010d", col("id_a")).as("id_a"),
            format_string("img_%010d", col("id_b")).as("id_b"))
        // layout-migration exactly-once: a checkpoint resumed from the old
        // flat layout may replay the tail batch whose pairs already sit
        // under batch=-1 — anti-join them out. Safe because a pair is
        // emitted by exactly one batch in the normal flow (see
        // migrateLegacyFlatPairs), so nothing legitimately new is dropped.
        val dedupedOut =
          if (legacyPairs == null) pairsOut
          else pairsOut.join(legacyPairs, Seq("id_a", "id_b"), "left_anti")
        dedupedOut.write.mode("overwrite").parquet(s"$pairsDir/batch=$batchId")
        // append this batch to the index partitioned by band-key bucket
        // (read-before-overwrite is unsafe; the index is append-only like an
        // Iceberg append commit, and the bucket dirs are its hash partition
        // spec). Repartition by bucket FIRST: without it every write task
        // opens a file in every bucket it holds rows for — up to
        // tasks×buckets files per batch, which pushed every bucket past the
        // compaction threshold every batch and turned compaction into a
        // full-index rewrite per batch (StreamBench measured ~24 s/batch on
        // 580-row batches). One file per touched bucket per batch restores
        // the intended cadence: a bucket compacts every ~CompactAfterFiles
        // batches, not every batch.
        keyed.select("bucket", "bv", "id", "phash", "tok")
          .repartition(col("bucket"))
          .write.mode("append").partitionBy("bucket").parquet(indexDir)
        // size-triggered compaction of the buckets this batch grew: keeps
        // per-bucket file count bounded over an unbounded ingest. Stale
        // `.compact-*` tmp dirs are swept ONCE here — before the pool below
        // exists — so the sweep can never race a live sibling compaction.
        sweepStaleCompactionDirs(indexDir)
        // compactions of DISTINCT buckets touch disjoint dirs and tmp paths:
        // run them through a small fixed pool so a batch that matures many
        // buckets pays ~⌈due/8⌉ compaction rounds of wall, not their sum
        val due = batchBuckets.filter(b =>
          bucketDataFiles(new java.io.File(indexDir, s"bucket=$b")).length > CompactAfterFiles)
        if (due.nonEmpty) {
          val pool = java.util.concurrent.Executors.newFixedThreadPool(
            math.min(8, due.length))
          try {
            val futures = due.map(b => pool.submit(new Runnable {
              override def run(): Unit = compactBucket(spark, indexDir, b)
            }))
            futures.foreach(_.get())
          } finally {
            // MUST fully drain before leaving the batch, including on
            // failure: a compaction thread outliving a failed foreachBatch
            // would break the single-serial-writer invariant — the
            // restarted batch's sweep would delete the orphan's live
            // `.compact-*` tmp dir mid-move. shutdownNow interrupts queued
            // + running tasks; awaitTermination bounds the drain, and an
            // incomplete drain FAILS the batch loudly (r6, advisor finding):
            // proceeding with a live compaction thread would silently void
            // the invariant the next batch's `.compact-*` sweep relies on.
            pool.shutdownNow()
            if (!pool.awaitTermination(5, java.util.concurrent.TimeUnit.MINUTES))
              throw new IllegalStateException(
                "compaction pool did not terminate within 5 min — failing the " +
                  "batch rather than leaving a live compaction thread behind")
          }
        }
        ()
      }
      .start()
  }
}
