package graft.tools

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession

/** dev tool (r6): dump `.explain("formatted")` of named SparkEntry queries
  * to plans/<dir>/<query>_<tag>.txt — the before/after evidence files the
  * optimization round commits. Runs on sf0.001 (plan SHAPE is scale-free;
  * AQE leaves `isFinalPlan=false` either way). Usage:
  * PlanSnap <outDir> <tag> <query>[,<query>...] [k=v,k=v...] */
object PlanSnap {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val tag = args(1)
    val names = args(2).split(',').toSeq
    val confs = args.drop(3).headOption.toSeq
      .flatMap(_.split(',')).map { kv =>
        val Array(k, v) = kv.split('='); (k, v)
      }
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    Files.createDirectories(Paths.get(outDir))
    for (name <- names) {
      val df = graft.SparkEntry.queries(name)(spark, "/root/testdata/sf0.001")
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.writeString(Paths.get(s"$outDir/${name}_$tag.txt"), txt)
      println(s"PLANSNAP wrote $outDir/${name}_$tag.txt")
    }
    spark.stop()
  }
}
