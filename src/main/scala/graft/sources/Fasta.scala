package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** FASTA source — the reference's only input format (parsed by `kseq.h` in
  * its examples, `/root/reference/examples/test.cpp:34-57`).
  *
  * Spark-native parse: `spark.read.text` with the record separator set to
  * `'>'` yields one row per FASTA entry, split declaratively into
  * `(name, comment, seq)` columns — no custom InputFormat, no UDF.
  */
object Fasta {

  def read(spark: SparkSession, path: String): DataFrame = {
    val raw = spark.read.option("lineSep", ">").text(path)
      .where(length(trim(col("value"))) > 0)
      .withColumn("header", substring_index(col("value"), "\n", 1))
      .withColumn("body", expr("substring(value, length(header) + 2)"))
    raw.select(
        substring_index(trim(col("header")), " ", 1).as("name"),
        when(col("header").contains(" "),
          trim(expr("substring(header, instr(header, ' ') + 1)")))
          .otherwise(lit("")).as("comment"),
        upper(regexp_replace(col("body"), "[\\n\\r \\t]", "")).as("seq"))
      .where(length(col("seq")) > 0)
  }
}
