package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.data.SyntheticImages
import graft.multimodal.Decode

/** dev tool: where does img_decode_meta time go at sf0.1 —
  * bytes scan, Dataset encoder round trip, or the actual decode? */
object DecodeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val corpus = SyntheticImages.ensure(spark, sfDir)
    def t(name: String)(f: => Any): Unit =
      (1 to 3).foreach { _ =>
        val t0 = System.nanoTime()
        f
        println(f"DPROBE $name%-18s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      }
    t("scan_bytes_len") {
      corpus.select(sum(length(col("bytes")))).head()
    }
    t("encoder_roundtrip") {
      corpus.select(col("image_id"), col("bytes")).as[(String, Array[Byte])]
        .mapPartitions(it => it.map { case (id, b) => (id, b.length) })
        .toDF("id", "n").agg(sum("n")).head()
    }
    t("decode_only") {
      corpus.select(col("image_id"), col("bytes")).as[(String, Array[Byte])]
        .mapPartitions { it =>
          val dec = new Decode.ReusableDecoder
          it.map { case (id, b) => (id, dec.decodePixels(b).length) }
        }.toDF("id", "n").agg(sum("n")).head()
    }
    t("full_image_meta") {
      Decode.imageMeta(corpus).toDF().agg(sum("w_dec")).head()
    }
    t("dims_only") {
      Decode.imageDims(corpus).toDF().agg(sum("w_dec")).head()
    }
    // scan-split A/B: decode is CPU-bound per row, so finer splits trade
    // per-task overhead for tail balance (68 tasks = 2.1 waves at 128m)
    for (mpb <- Seq("128m", "64m", "32m", "128m")) {
      spark.conf.set("spark.sql.files.maxPartitionBytes", mpb)
      t(s"dims_mpb_$mpb") {
        Decode.imageDims(spark.read.parquet(SyntheticImages.corpusPath(sfDir)))
          .toDF().agg(sum("w_dec")).head()
      }
    }
    spark.stop()
  }
}
