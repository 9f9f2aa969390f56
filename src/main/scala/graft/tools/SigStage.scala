package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.data.SyntheticImages
import graft.pipeline.Dedup
import graft.sketch.MinHash

/** dev tool (r6): same-session A/B of the signature stage with the SIMD
  * minhash kernel on vs off — interleaved rounds so host drift cannot be
  * attributed to the kernel. Not part of the driver contract. */
object SigStage {
  def main(args: Array[String]): Unit = {
    graft.Bench.sweepStaleLocalDirs()
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.local.dir", "/dev/shm/spark-graft")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val c = SyntheticImages.ensure(spark, "/root/testdata/sf0.1")
    def sigAgg(): Unit = {
      Dedup.signatures(c)
        .agg(avg(element_at(col("minhash"), 1).cast("double"))).head(): Unit
    }
    // warmup both paths
    MinHash.simdEnabled = true; sigAgg()
    MinHash.simdEnabled = false; sigAgg()
    (1 to 4).foreach { r =>
      for (simd <- Seq(true, false)) {
        MinHash.simdEnabled = simd
        val t0 = System.nanoTime()
        sigAgg()
        println(f"SIGSTAGE round=$r simd=$simd ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      }
    }
    MinHash.simdEnabled = true
    spark.stop()
  }
}
