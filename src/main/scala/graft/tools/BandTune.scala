package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.data.SyntheticImages
import graft.pipeline.Dedup
import graft.sketch.MinHash

/** dev tool: empirical LSH recall per band config over the exact dup-pair
  * set — drives the bands×rows choice (shuffle volume scales linearly with
  * the band count). Not part of the driver contract. */
object BandTune {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val corpus = SyntheticImages.ensure(spark, sfDir)
    val sigs = Dedup.signatures(corpus)
      .select(col("image_id"), col("minhash"), col("simhash")).cache()
    val exact = Dedup.dupPairs(corpus)
    val rows = exact
      .join(sigs.toDF("id_a", "sig_a", "sh_a"), "id_a")
      .join(sigs.toDF("id_b", "sig_b", "sh_b"), "id_b")
      .select("sig_a", "sig_b", "sh_a", "sh_b")
      .collect()
    val pairSigs = rows.map(r => (r.getSeq[Long](0).toArray, r.getSeq[Long](1).toArray))
    println(s"TUNE pairs=${pairSigs.length}")
    // simhash hamming distribution + pigeonhole-block recall of dup pairs
    val shHam = rows.map(r => java.lang.Long.bitCount(r.getLong(2) ^ r.getLong(3))).sorted
    def hpct(p: Double) = shHam((p * (shHam.length - 1)).toInt)
    println(s"TUNE simhash_hamming p50=${hpct(0.5)} p90=${hpct(0.9)} p99=${hpct(0.99)} max=${shHam.last}")
    for (blocks <- Seq(4, 8)) {
      val caught = rows.count { r =>
        val a = graft.spark.expr.Kernels.interleavedBlockKeys(r.getLong(2), blocks).toLongArray()
        val b = graft.spark.expr.Kernels.interleavedBlockKeys(r.getLong(3), blocks).toLongArray()
        a.zip(b).exists { case (x, y) => x == y }
      }
      println(f"TUNE simhash_blocks=$blocks recall=${caught.toDouble / rows.length}%.5f")
    }
    val simDist = pairSigs.map { case (a, b) => MinHash.sigJaccard(a, b) }.sorted
    def pct(p: Double) = simDist((p * (simDist.length - 1)).toInt)
    println(f"TUNE sig_jaccard p0=${simDist.head}%.3f p1=${pct(0.01)}%.3f p5=${pct(0.05)}%.3f p50=${pct(0.5)}%.3f")
    for ((b, r) <- Seq((32, 4), (24, 4), (20, 4), (16, 4), (12, 4), (25, 5), (16, 5), (32, 6), (21, 6))) {
      val caught = pairSigs.count { case (x, y) =>
        val ka = MinHash.bandKeys(x, b, r)
        val kb = MinHash.bandKeys(y, b, r)
        var i = 0; var hit = false
        while (i < b && !hit) { hit = ka(i) == kb(i); i += 1 }
        hit
      }
      println(f"TUNE bands=$b%2d rows=$r recall=${caught.toDouble / pairSigs.length}%.5f")
    }
    spark.stop()
  }
}
