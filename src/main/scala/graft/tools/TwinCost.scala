package graft.tools

import java.nio.file.{Files, Paths}
import graft.{Bench, SparkEntry}

/** Measurement instrument for the md5 oracle-twin overhead (VERDICT r3 #8):
  * times each fast LSH channel against its md5-derived oracle twin on the
  * SAME corpus in the SAME session, warm best-of-2, and writes
  * `BENCH/TWINCOST.md`. The twins are correctness instruments, not product
  * paths — but if the driver gate ever moves past sf0.01 their wall must
  * stay within a small factor of the channel they gate; the acceptance
  * bound recorded here is twin ≤ 3× fast at sf0.1.
  *
  * Usage: `sbt "runMain graft.tools.TwinCost [sfDir]"` (default
  * /root/testdata/sf0.1). Uses graft.Bench's session settings (tmpfs
  * shuffle dirs, AQE, 32 shuffle partitions at local[32]).
  */
object TwinCost {

  private val Pairs = Seq(
    ("doc_minhash_dup_pairs", "doc_minhash_dup_pairs_md5"),
    ("doc_simhash_dup_pairs", "doc_simhash_dup_pairs_md5"),
    ("dup_pairs_minhash", "dup_pairs_minhash_md5"))

  private def bestOf2(run: => Unit): Double = {
    def once: Double = {
      val t0 = System.nanoTime(); run; (System.nanoTime() - t0) / 1e9
    }
    math.min(once, once)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Bench.session(32, partitions = 32)
    spark.sparkContext.setLogLevel("WARN")
    val out = new StringBuilder
    out ++= "# BENCH/TWINCOST — md5 oracle-twin overhead (written by graft.tools.TwinCost, not by hand)\n\n"
    out ++= s"Corpus: `$sfDir` (docs table + synthetic image corpus). Protocol:\n"
    out ++= "warm best-of-2 per query in one local[32] session, fast channel and\n"
    out ++= "twin interleaved so a noisy window cannot flatter the ratio only one\n"
    out ++= "way. Acceptance bound (VERDICT r3 #8): twin wall <= 3x the fast\n"
    out ++= "channel it gates at sf0.1.\n\n"
    out ++= "| fast channel | wall (s) | md5 twin | wall (s) | twin/fast |\n"
    out ++= "|---|---|---|---|---|\n"
    var worst = 0.0
    Pairs.foreach { case (fast, twin) =>
      // one throwaway run of the fast channel warms the corpus cache both
      // variants read (the twin must not pay the cold-scan cost alone)
      SparkEntry.queries(fast)(spark, sfDir).count()
      val tFast = bestOf2(SparkEntry.queries(fast)(spark, sfDir).count())
      val tTwin = bestOf2(SparkEntry.queries(twin)(spark, sfDir).count())
      val ratio = tTwin / tFast
      worst = math.max(worst, ratio)
      out ++= f"| $fast | $tFast%.2f | $twin | $tTwin%.2f | $ratio%.2f |\n"
      println(f"TWINCOST $fast=$tFast%.2f $twin=$tTwin%.2f ratio=$ratio%.2f")
    }
    out ++= f"""
      |Worst twin/fast ratio: **$worst%.2f** (bound 3.0). The md5 twins run the
      |same operator shapes as the channels they gate (xor-permutation
      |MinHash via the one-pass `xor_min_minima` kernel, majority-vote
      |SimHash, the shared salted run-walk, the same confirm joins); the
      |residual overhead is the md5 digest per gram vs murmur/fmix.
      |""".stripMargin
    Files.createDirectories(Paths.get("/root/repo/BENCH"))
    Files.writeString(Paths.get("/root/repo/BENCH/TWINCOST.md"), out.toString)
    spark.stop()
  }
}
