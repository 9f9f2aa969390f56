package graft.tools
import org.apache.spark.sql.SparkSession
object PlanCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries("dup_pairs")(spark, "/root/testdata/sf0.001")
    val counted = df.groupBy().count()
    println("=== count-plan over ordered dup_pairs ===")
    println(counted.queryExecution.executedPlan.toString.take(3000))
    spark.stop()
  }
}
