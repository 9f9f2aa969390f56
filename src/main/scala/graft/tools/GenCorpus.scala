package graft.tools

import org.apache.spark.sql.SparkSession
import graft.data.SyntheticImages

/** dev tool: materialize a synthetic corpus ahead of benchmarking.
  * Args: sfDir [lite]. `lite` writes the bytes-free variant
  * ([[SyntheticImages.ensureLite]]) used by the sf1 scale proof. */
object GenCorpus {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val lite = args.length > 1 && args(1) == "lite"
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-gen")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    val df =
      if (lite) SyntheticImages.ensureLite(spark, sfDir)
      else SyntheticImages.ensure(spark, sfDir)
    val n = df.count()
    println(f"generated rows=$n in ${(System.nanoTime() - t0) / 1e9}%.1f s " +
      s"at ${if (lite) SyntheticImages.litePath(sfDir) else SyntheticImages.corpusPath(sfDir)}")
    spark.stop()
  }
}
