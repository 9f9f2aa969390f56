package graft.pipeline

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.data.SyntheticImages
import graft.sketch.UnionFind
import graft.spark.{functions => gf}

class PipelineSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  lazy val corpus = {
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    spark.createDataset(
      (0L until 400L).flatMap(fid => SyntheticImages.family(fid, 42L, fid * 8))
    ).toDF().cache()
  }

  test("payload fidelity: PNG lossless roundtrip, JPEG PSNR >= 40 dB") {
    val rows = (0L until 20L).flatMap(fid => SyntheticImages.family(fid, 42L, fid * 8))
    assert(rows.exists(_.fmt == "png") && rows.exists(_.fmt == "jpeg"))
    // regenerate the family deterministically → same bytes (generator determinism)
    val again = (0L until 20L).flatMap(fid => SyntheticImages.family(fid, 42L, fid * 8))
    assert(rows.map(_.caption) == again.map(_.caption))
    assert(rows.zip(again).forall { case (a, b) => java.util.Arrays.equals(a.bytes, b.bytes) })
    // decoded pixels of a JPEG vs its PNG sibling of the same underlying raster
    // are not comparable directly; instead check encode→decode PSNR per row
    for (r <- rows.take(40)) {
      val px = SyntheticImages.decodePixels(r.bytes)
      assert(px.length === r.w * r.h)
      // re-encode decoded pixels losslessly and decode again → identical (decode is stable)
      val px2 = SyntheticImages.decodePixels(SyntheticImages.encode(px, "png"))
      assert(SyntheticImages.psnr(px, px2).isInfinity)
    }
  }

  test("JPEG encode quality preserves pixels at PSNR >= 40 dB") {
    // access a known raster via family(): decode a png row as the raster
    val rows = (100L until 120L).flatMap(fid => SyntheticImages.family(fid, 42L, fid * 8))
    val pngRow = rows.find(_.fmt == "png").get
    val raster = SyntheticImages.decodePixels(pngRow.bytes)
    val jpegBytes = SyntheticImages.encode(raster, "jpeg")
    val decoded = SyntheticImages.decodePixels(jpegBytes)
    val p = SyntheticImages.psnr(raster, decoded)
    assert(p >= 40.0, s"psnr=$p")
  }

  test("minhash LSH candidate recall >= 0.99 vs exact dup pairs") {
    val exact = Dedup.dupPairs(corpus).collect().map(r => (r.getString(0), r.getString(1))).toSet
    val lsh = Dedup.confirm(Dedup.candidatesMinhash(Dedup.signatures(corpus)), corpus)
      .select("id_a", "id_b").collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(exact.nonEmpty)
    val recall = lsh.intersect(exact).size.toDouble / exact.size
    assert(recall >= 0.99, s"recall=$recall (${lsh.size} lsh vs ${exact.size} exact)")
    // LSH+confirm must never produce a pair outside the exact predicate
    assert(lsh.subsetOf(exact))
  }

  test("simhash channel: exact-subset pairs, recall in the measured regime") {
    val exact = Dedup.dupPairs(corpus).collect().map(r => (r.getString(0), r.getString(1))).toSet
    val sh = Dedup.dupPairsSimhash(corpus)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    // confirm applies the same exact predicate, so precision is 1.0
    assert(sh.subsetOf(exact))
    // image captions churn ~10% of tokens → wide simhash Hamming (BandTune:
    // p50=11); the channel is documented as near-identical-regime only, and
    // its measured recall there is ~0.85 — assert it stays in that band
    val recall = sh.intersect(exact).size.toDouble / exact.size
    assert(recall >= 0.75, s"simhash-channel recall $recall (${sh.size} vs ${exact.size})")
  }

  test("clusters match local union-find over the same edges") {
    val edges = Dedup.dupPairs(corpus).collect().map(r => (r.getString(0), r.getString(1)))
    val ids = corpus.select("image_id").collect().map(_.getString(0))
    val num = ids.map(s => s -> s.drop(4).toLong).toMap
    val uf = new UnionFind
    ids.foreach(id => uf.find(num(id)))
    edges.foreach { case (a, b) => uf.union(num(a), num(b)) }
    val expect = uf.components().map { case (k, v) => (f"img_$k%010d", f"img_$v%010d") }
    val got = Dedup.clusters(Dedup.dupPairs(corpus), corpus.select("image_id"))
      .collect().map(r => (r.getString(0), r.getString(1))).toMap
    assert(got === expect)
    // distributed label-propagation path (localThreshold = 0) must agree
    val gotDist = Dedup.clusters(Dedup.dupPairs(corpus), corpus.select("image_id"),
        localThreshold = 0L)
      .collect().map(r => (r.getString(0), r.getString(1))).toMap
    assert(gotDist === expect)
  }

  test("clustersLocalThreshold: floored at 20M edges, scales with driver heap") {
    // small heaps keep the field-proven floor
    assert(Dedup.clustersLocalThreshold(1L << 30) === 20000000L)
    assert(Dedup.clustersLocalThreshold(8L << 30) === 20000000L)
    // big heaps admit proportionally more (1/8 heap at ~64 B/edge —
    // packed-primitive collect, see clustersLocal)
    val at64g = Dedup.clustersLocalThreshold(64L << 30)
    assert(at64g === (64L << 30) / 8 / 64)
    assert(at64g > 20000000L)
    assert(Dedup.clustersLocalThreshold(256L << 30) === (256L << 30) / 8 / 64)
    // default reads the live heap and is always at least the floor
    assert(Dedup.clustersLocalThreshold() >= 20000000L)
  }

  test("spark aggregate merge laws: sig_merge / minhash_merge / hll union") {
    import spark.implicits._
    val docs = (0 until 64).map(i => (i % 4, s"grp${i % 4} token$i payload $i content")).toDF("g", "text")
    val sigs = docs.select(col("g"), gf.minhash_sig(gf.caption_shingles(col("text"), 4)).as("sig"),
      gf.bottomk_sketch(gf.caption_shingles(col("text"), 4), 64).as("bk"))
    // distributed merge (partial+final over 4 partitions)
    val merged = sigs.repartition(4).groupBy("g")
      .agg(gf.sig_merge(col("sig")).as("msig"), gf.minhash_merge(col("bk"), 64).as("mbk"))
      .collect().map(r => r.getInt(0) -> (r.getSeq[Long](1), r.getSeq[Long](2))).toMap
    // single-pass per group: concat text features group-wise then sketch once
    val single = docs.as[(Int, String)].collect().groupBy(_._1).map { case (g, rows) =>
      val feats = rows.flatMap(r => graft.sketch.Shingles.charShingles(r._2, 4)).toArray
      g -> (graft.sketch.MinHash.minhashSig(feats, graft.sketch.MinHash.permAffine(128, 42)).toSeq,
        graft.sketch.MinHash.bottomK(feats, 64).toSeq)
    }
    assert(merged === single)
  }

  test("hll_agg ~ approx distinct; merge across partitions consistent") {
    import spark.implicits._
    val n = 50000
    val df = spark.range(n).select(xxhash64(col("id")).as("h"))
    val est = df.repartition(8).agg(gf.hll_card(gf.hll_agg(col("h"), 14))).head().getDouble(0)
    assert(math.abs(est - n) / n < 0.05, s"est=$est")
  }

  test("SQL registration: expressions usable from spark.sql") {
    gf.registerAll(spark)
    corpus.limit(50).createOrReplaceTempView("imgs")
    val out = spark.sql(
      """SELECT image_id,
        |  simhash64(caption_shingles(caption, 5)) AS sh,
        |  hll_card(hll_init(caption_shingles(caption, 5), 12)) AS card,
        |  sig_jaccard(minhash_sig(caption_shingles(caption, 5), 128, 42),
        |              minhash_sig(caption_shingles(caption, 5), 128, 42)) AS selfj
        |FROM imgs""".stripMargin).collect()
    assert(out.length === 50)
    assert(out.forall(_.getDouble(3) === 1.0))
    assert(out.forall(r => r.getDouble(2) > 0))
  }

  test("plan quality: signature stage prunes bytes and stays codegen'd") {
    val path = java.nio.file.Files.createTempDirectory("planq").toString
    corpus.write.mode("overwrite").parquet(path)
    val sigs = Dedup.signatures(spark.read.parquet(path))
    val plan = sigs.queryExecution.executedPlan.toString
    assert(plan.contains("*(1)"), "signature stage not codegen'd")  // *(N) marks a WholeStageCodegen stage
    val scanLine = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!scanLine.contains("bytes"), s"bytes column not pruned from scan: $scanLine")
  }

  test("plan quality: candidate generation is one wide shuffle, no hot branch when no hot buckets") {
    val path = java.nio.file.Files.createTempDirectory("planq2").toString
    corpus.write.mode("overwrite").parquet(path)
    val cand = Dedup.candidatesPhashBlocks(spark.read.parquet(path))
    // the eager checkpoint inside already ran the walk; the remaining plan
    // must be: scan of the checkpointed walk output -> filter markers ->
    // distinct (one exchange) -- the expensive upstream appears nowhere
    val plan = cand.queryExecution.executedPlan.toString
    assert(!plan.contains("phash_block_keys"), "upstream re-executed past the checkpoint")
    assert(!plan.contains("Scan parquet"), "corpus re-scanned past the checkpoint")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges <= 1, s"expected at most the distinct's exchange, got $exchanges:\n$plan")
  }

  test("substring confirm == char-L-gram brute force (lcs >= L identity)") {
    val minLen = 12
    val got = Dedup.confirmSubstring(Dedup.candidatesPhashBlocks(corpus), corpus, minLen = minLen)
      .select("id_a", "id_b").collect().map(r => (r.getString(0), r.getString(1))).toSet
    val rows = corpus.select("image_id", "phash", "caption").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    def grams(s: String): Set[String] =
      (0 to s.length - minLen).map(i => s.substring(i, i + minLen)).toSet
    val gramsById = rows.map { case (id, _, c) => id -> grams(c) }.toMap
    val brute = (for {
      (ia, pa, _) <- rows; (ib, pb, _) <- rows
      if ia < ib && java.lang.Long.bitCount(pa ^ pb) <= 3 &&
        gramsById(ia).intersect(gramsById(ib)).nonEmpty
    } yield (ia, ib)).toSet
    assert(brute.nonEmpty)
    assert(got === brute)
  }

  test("GraftExtensions injects the SQL functions at the extension point") {
    import org.apache.spark.sql.SparkSessionExtensions
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    val ext = new SparkSessionExtensions
    new graft.spark.GraftExtensions().apply(ext)
    val reg = spark.sessionState.functionRegistry.clone()
    org.apache.spark.sql.graft.Bridge.applyInjectedFunctions(ext, reg)
    for (name <- graft.spark.functions.sqlBuilders.map(_._1))
      assert(reg.functionExists(FunctionIdentifier(name)), s"$name not injected")
  }

  test("suffix-array LCS confirm column works on pipeline captions") {
    val pairs = Dedup.confirm(Dedup.candidatesPhashBlocks(corpus), corpus)
      .limit(20)
    val withLcs = pairs
      .join(corpus.select(col("image_id").as("id_a"), col("caption").as("ca")), "id_a")
      .join(corpus.select(col("image_id").as("id_b"), col("caption").as("cb")), "id_b")
      .withColumn("lcs", gf.lcs_len(col("ca"), col("cb")))
      .collect()
    assert(withLcs.forall(r => r.getAs[Int]("lcs") > 0))
  }
}
