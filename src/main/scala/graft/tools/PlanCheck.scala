package graft.tools
import org.apache.spark.sql.SparkSession
object PlanCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries("events_sessions")(spark, "/root/testdata/sf0.001")
    df.count() // execute so AQE finalizes
    val p = df.queryExecution.executedPlan.toString
    println("=== events_sessions executed plan (reuse markers) ===")
    println("ReusedExchange count: " + "ReusedExchange".r.findAllIn(p).length)
    println("Window count: " + "Window".r.findAllIn(p).length)
    println("Exchange count: " + "Exchange".r.findAllIn(p).length)
    println("Scan count: " + "Scan parquet".r.findAllIn(p).length + " / FileScan " + "FileScan".r.findAllIn(p).length)
    spark.stop()
  }
}
