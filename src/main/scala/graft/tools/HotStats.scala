package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.data.SyntheticImages
import graft.pipeline.Dedup
import graft.spark.{functions => gf}

/** dev tool: bucket-size distribution of both LSH channels at a given sf —
  * how much work the hot-bucket salted path actually handles.
  * `SPARK_GRAFT_LITE=1` reads the bytes-free lite corpus (sf0.3/sf1). */
object HotStats {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val c = if (sys.env.get("SPARK_GRAFT_LITE").contains("1"))
      SyntheticImages.ensureLite(spark, sfDir)
    else SyntheticImages.ensure(spark, sfDir)
    // match the SHIPPED routing (Dedup.saltedBucketPairs): a run markers out
    // as hot when members exceed hotThreshold (default 1<<20 — NOT 16384,
    // which is only BucketRunPairs' initial buffer allocation; runs between
    // the two are handled inline by the walk); pair-dense runs (surviving
    // pairs > the 8M buffer) also marker out — raw crossPairs > 8M is the
    // computable upper-bound proxy for that here
    val hotThreshold = sys.env.getOrElse("SPARK_GRAFT_HOT_THRESHOLD", "1048576").toLong
    val pairCap = (8L << 20)
    def stats(name: String, keyed: org.apache.spark.sql.DataFrame): Unit = {
      val sizes = keyed.groupBy("bv").agg(count(lit(1)).as("n")).localCheckpoint()
      val row = sizes.agg(count(lit(1)).as("buckets"),
        max(col("n")).as("max"),
        sum(when(col("n") > 1, (col("n") * (col("n") - 1) / 2).cast("long")).otherwise(0L)).as("pairs"),
        sum(when(col("n") > hotThreshold, 1L).otherwise(0L)).as("hot"),
        sum(when(col("n") === 1, 1L).otherwise(0L)).as("singletons"),
        sum(when(col("n") * (col("n") - 1) / 2 > pairCap, 1L).otherwise(0L)).as("pairDense"),
        sum(when(col("n") > hotThreshold, (col("n") * (col("n") - 1) / 2).cast("long")).otherwise(0L)).as("hotPairs"),
        sum(when(col("n") > hotThreshold, col("n")).otherwise(0L)).as("hotMembers")).head()
      println(s"HOT $name buckets=${row.getLong(0)} singletons=${row.getLong(4)} " +
        s"maxBucket=${row.getLong(1)} crossPairs=${row.getLong(2)} " +
        s"hotBuckets(>$hotThreshold members)=${row.getLong(3)} " +
        s"rawPairDense(>8M raw pairs)=${row.getLong(5)} " +
        s"hotCrossPairs=${row.getLong(6)} hotMembers=${row.getLong(7)}")
      // log2 size histogram: where the members and raw-pair mass live
      val histo = sizes.where(col("n") > 1)
        .groupBy(floor(log2(col("n"))).as("log2n"))
        .agg(count(lit(1)).as("buckets"), sum(col("n")).as("members"),
          sum((col("n") * (col("n") - 1) / 2).cast("long")).as("rawPairs"))
        .orderBy("log2n").collect()
      histo.foreach(r => println(s"HISTO $name log2=${r.getLong(0)} " +
        s"buckets=${r.getLong(1)} members=${r.getLong(2)} rawPairs=${r.getLong(3)}"))
    }
    stats("minhash_bands", Dedup.signatures(c)
      .select(col("image_id"), explode(gf.band_keys(col("minhash"), 32, 4)).as("bv")))
    if (!sys.env.get("SPARK_GRAFT_SKIP_PHASH").contains("1"))
      stats("phash_blocks", c.select(expr("cast(substring(image_id,5) as bigint)").as("id"),
        explode(gf.phash_block_keys(col("phash"), 4)).as("bv")))
    spark.stop()
  }
}
