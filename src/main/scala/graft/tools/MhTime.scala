package graft.tools
import org.apache.spark.sql.SparkSession
import graft.data.SyntheticImages
import graft.pipeline.Dedup
object MhTime {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.local.dir", "/dev/shm/spark-graft")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L*1024*1024).toString)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val c = SyntheticImages.ensure(spark, "/root/testdata/sf0.1")
    Dedup.dupPairsMinhash(SyntheticImages.ensure(spark, "/root/testdata/sf0.001")).count()
    (1 to 3).foreach { _ =>
      val t0 = System.nanoTime()
      Dedup.dupPairsMinhash(c).count()
      println(f"MHTIME ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    spark.stop()
  }
}
