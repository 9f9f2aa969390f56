package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.data.SyntheticImages
import graft.pipeline.Dedup
import graft.spark.{functions => gf}

/** dev tool (r6): A/B the confirm-join shapes at sf0.1 — shuffle_hash on
  * recomputed prepared sides (shipped), hint-free (Catalyst/AQE choice),
  * and a single checkpointed prepared frame reused by both sides. */
object ConfirmProbe {
  def main(args: Array[String]): Unit = {
    graft.Bench.sweepStaleLocalDirs()
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.local.dir", "/dev/shm/spark-graft")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val corpus = SyntheticImages.ensure(spark, "/root/testdata/sf0.1")
    val cfg = Dedup.defaultConfig

    def prepared(c: DataFrame): DataFrame = c.select(
      expr("cast(substring(image_id, 5) as bigint)").as("id"),
      col("phash"), gf.token_ngrams(col("caption"), 1).as("tok"))

    // candidate set computed once, checkpointed (identical input to all legs)
    val cand = Dedup.candidatesPhashBlocks(corpus).localCheckpoint()
    println(s"CPROBE candidates=${cand.count()}")

    def confirmOn(rowsA: DataFrame, rowsB: DataFrame, hint: String): DataFrame = {
      val j1 = if (hint == "none") cand.join(rowsA.toDF("id_a", "phash_a", "tok_a"), "id_a")
        else cand.hint(hint).join(rowsA.toDF("id_a", "phash_a", "tok_a"), "id_a")
      val j2 = if (hint == "none") j1.join(rowsB.toDF("id_b", "phash_b", "tok_b"), "id_b")
        else j1.hint(hint).join(rowsB.toDF("id_b", "phash_b", "tok_b"), "id_b")
      j2.withColumn("hamming", bit_count(col("phash_a").bitwiseXOR(col("phash_b"))))
        .where(col("hamming") <= cfg.hammingThreshold)
        .withColumn("jaccard", gf.exact_jaccard(col("tok_a"), col("tok_b")))
        .where(col("jaccard") >= cfg.tokenJaccard)
        .select("id_a", "id_b")
    }

    def t(name: String)(f: => Long): Unit =
      (1 to 3).foreach { _ =>
        val t0 = System.nanoTime()
        val n = f
        println(f"CPROBE $name%-24s ${(System.nanoTime() - t0) / 1e9}%6.2f s (rows=$n)")
      }

    // interleaved rounds: r5 full-corpus shape (tokenize per side) vs
    // tokenize-once-checkpoint vs the shipped gated confirm, so host drift
    // cannot be attributed to any one leg
    (1 to 3).foreach { _ =>
      t("old_full_shuffle") { confirmOn(prepared(corpus), prepared(corpus), "shuffle_hash").count() }
      t("prepared_ckpt") {
        val p = prepared(corpus).localCheckpoint()
        confirmOn(p, p, "shuffle_hash").count()
      }
      t("shipped_gated") { Dedup.confirm(cand, corpus).select("id_a", "id_b").count() }
    }
    spark.stop()
  }
}
