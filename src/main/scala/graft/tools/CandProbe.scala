package graft.tools

import org.apache.spark.sql.functions._
import graft.Bench
import graft.data.SyntheticImages
import graft.pipeline.Dedup
import graft.spark.{functions => gf}

/** dev tool: sub-step timing of the banded-candidate stage at a given sf —
  * walk / hot-filter recompute / refined walk / distinct, with row counts —
  * to locate the residual super-linear term at sf1. */
object CandProbe {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("sf1")
    val parts = sf match { case "sf1" => 320; case "sf0.3" => 96; case _ => 32 }
    val spark = Bench.session(32, partitions = parts)
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val corpus = SyntheticImages.ensureLite(spark, s"/root/testdata/$sf")
    val cfg = Dedup.defaultConfig
    val sigs = Dedup.signatures(corpus)
      .select(col("image_id"), col("phash"),
        gf.band_keys(col("minhash"), cfg.bands, cfg.rowsPerBand).as("bands"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    println(s"CAND sigs=${sigs.count()}")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"CAND $name%-16s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    val keyed = sigs
      .select(expr("cast(substring(image_id,5) as bigint)").as("id"), col("phash"),
        explode(col("bands")).as("bv"))
    val maxHamming = cfg.hammingThreshold
    val hotThreshold = 1 << 20
    val walked = t("walk") {
      val w = keyed.select(col("bv"), col("id"), col("phash"))
        .repartition(col("bv"))
        .sortWithinPartitions(col("bv"))
        .as[Dedup.BandedRow]
        .mapPartitions(it => new Dedup.BucketRunPairs(it, maxHamming, hotThreshold))
        .toDF("id_a", "id_b")
        .localCheckpoint()
      println(s"CAND walked_rows=${w.count()}")
      w
    }
    val hotBvs = t("hot_collect") {
      walked.where(col("id_a") === Long.MinValue)
        .select(col("id_b")).distinct().as[Long].collect()
    }
    println(s"CAND hot_buckets=${hotBvs.length}")
    val small = walked.where(col("id_a") =!= Long.MinValue)
    val hotKeyed = t("hot_filter") {
      val h = keyed.where(col("bv").isInCollection(hotBvs)).localCheckpoint()
      println(s"CAND hot_members=${h.count()}")
      h
    }
    val refined = hotKeyed
      .select(col("bv").as("obv"), col("id"), col("phash"),
        explode(gf.phash_block_keys(col("phash"), maxHamming + 1)).as("ck"))
      .select(xxhash64(col("obv"), col("ck")).as("bv"), col("id"), col("phash"))
    val walked2 = t("refined_walk") {
      val w = refined.select(col("bv"), col("id"), col("phash"))
        .repartition(col("bv"))
        .sortWithinPartitions(col("bv"))
        .as[Dedup.BandedRow]
        .mapPartitions(it => new Dedup.BucketRunPairs(it, maxHamming, hotThreshold))
        .toDF("id_a", "id_b")
        .localCheckpoint()
      println(s"CAND walked2_rows=${w.count()}")
      w
    }
    val dense = walked2.where(col("id_a") === Long.MinValue).count()
    println(s"CAND dense_buckets=$dense")
    val small2 = walked2.where(col("id_a") =!= Long.MinValue)
    t("distinct") {
      println(s"CAND final_pairs=${small.union(small2).distinct().count()}")
    }
    spark.stop()
  }
}
