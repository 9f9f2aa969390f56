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
      .select(col("image_id"), col("minhash")).cache()
    val exact = Dedup.dupPairs(corpus)
    val pairSigs = exact
      .join(sigs.toDF("id_a", "sig_a"), "id_a")
      .join(sigs.toDF("id_b", "sig_b"), "id_b")
      .select("sig_a", "sig_b")
      .collect()
      .map(r => (r.getSeq[Long](0).toArray, r.getSeq[Long](1).toArray))
    println(s"TUNE pairs=${pairSigs.length}")
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
