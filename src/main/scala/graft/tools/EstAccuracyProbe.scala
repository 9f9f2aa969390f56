package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** dev tool: calibrate the `doc_est_accuracy` bounds (VERDICT r4 #5/#6) by
  * printing the measured |estimate − exact| deviation distribution of the
  * CWS weighted-jaccard and HLL joint-MLE estimators against their exact
  * companions at one or more sf dirs. Not part of the driver contract.
  *
  * usage: EstAccuracyProbe [sfDir ...]   (default sf0.001 + sf0.01)
  */
object EstAccuracyProbe {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[32]")
      .appName("est-accuracy-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (dir <- dirs) {
      val d = spark.read.parquet(s"$dir/documents.parquet")
      val pairs = graft.docs.DocOps.ngramDupPairsExact(d, 3, 0.6)
      val dbg = graft.oracle.Md5Channels.docEstAccuracyDebug(d, pairs)
        .withColumn("wj_dev", abs(col("cws_est") - col("wj_exact")))
        .withColumn("hll_dev", abs(col("hll_est") - col("shingle_j_exact")))
      val r = dbg.agg(
        count(lit(1)).as("n"),
        max(col("wj_dev")).as("wj_max"), avg(col("wj_dev")).as("wj_avg"),
        max(col("hll_dev")).as("hll_max"), avg(col("hll_dev")).as("hll_avg"),
        sum(when(!col("wjaccard_ok"), 1).otherwise(0)).as("wj_fail"),
        sum(when(!col("hll_mle_ok"), 1).otherwise(0)).as("hll_fail")).head()
      println(f"ESTPROBE $dir pairs=${r.getLong(0)} " +
        f"wj_dev max=${r.getDouble(1)}%.4f avg=${r.getDouble(2)}%.4f " +
        f"hll_dev max=${r.getDouble(3)}%.4f avg=${r.getDouble(4)}%.4f " +
        f"fails wj=${r.getLong(5)} hll=${r.getLong(6)}")
      dbg.select("id_a", "id_b", "wj_exact", "cws_est", "shingle_j_exact", "hll_est")
        .orderBy(desc("wj_exact")).show(8, truncate = false)
    }
    spark.stop()
  }
}
