package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.spark.{functions => gf}

/** FASTA → sketch → pairwise estimate: the reference's EP1/EP2 workload
  * (`/root/reference/examples/test.cpp`, `examples/main.cpp`) expressed over
  * our engine. */
class FastaSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  def writeFasta(entries: Seq[(String, String, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("fasta")
    val content = entries.map { case (name, comment, seq) =>
      val header = if (comment.isEmpty) name else s"$name $comment"
      // wrap sequence at 60 cols like real FASTA
      s">$header\n${seq.grouped(60).mkString("\n")}"
    }.mkString("\n") + "\n"
    java.nio.file.Files.writeString(dir.resolve("test.fna"), content)
    dir.toString
  }

  def randDna(seed: Long, n: Int): String = {
    val g = new graft.hash.HashKernels.SplitMix64(seed)
    (0 until n).map(_ => "ACGT"(((g.nextLong() >>> 1) % 4).toInt)).mkString
  }

  test("FASTA parse: names, comments, multi-line sequences, case folding") {
    spark.sparkContext.setLogLevel("WARN")
    val seq1 = randDna(1, 500)
    val seq2 = randDna(2, 333)
    val path = writeFasta(Seq(
      ("genome1", "sample comment here", seq1),
      ("genome2", "", seq2.toLowerCase)))
    val rows = Fasta.read(spark, path).orderBy("name").collect()
    assert(rows.length === 2)
    assert(rows(0).getString(0) === "genome1")
    assert(rows(0).getString(1) === "sample comment here")
    assert(rows(0).getString(2) === seq1)
    assert(rows(1).getString(0) === "genome2")
    assert(rows(1).getString(1) === "")
    assert(rows(1).getString(2) === seq2) // uppercased
  }

  test("EP2 all-vs-all workload: FASTA -> sketches -> pairwise estimates") {
    val base = randDna(5, 20000)
    val mutated = base.substring(0, 15000) + randDna(6, 5000) // ~75% shared
    val unrelated = randDna(7, 20000)
    val path = writeFasta(Seq(
      ("g1", "", base), ("g2", "", mutated), ("g3", "", unrelated)))
    val sketches = Fasta.read(spark, path)
      .select(col("name"),
        gf.bottomk_sketch(gf.dna_canonical_kmers(col("seq"), 21), 1000).as("mh"),
        gf.hll_init(gf.dna_canonical_kmers(col("seq"), 21), 12).as("hll"))
    val a = sketches.toDF("na", "mha", "hlla")
    val b = sketches.toDF("nb", "mhb", "hllb")
    val pairs = a.join(b, col("na") < col("nb"))
      .select(col("na"), col("nb"),
        gf.sketch_jaccard(col("mha"), col("mhb"), 1000).as("jaccard"),
        gf.mash_dist(gf.sketch_jaccard(col("mha"), col("mhb"), 1000), 21).as("mash"),
        gf.hll_jaccard(col("hlla"), col("hllb")).as("hll_j"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    val (j12, d12, h12) = pairs(("g1", "g2"))
    val (j13, d13, _) = pairs(("g1", "g3"))
    assert(j12 > 0.5 && j12 < 0.75, s"g1-g2 jaccard $j12") // ~15k/25k shared kmers
    assert(j13 < 0.01, s"unrelated jaccard $j13")
    assert(d12 < d13, "mash distance must order by relatedness")
    assert(math.abs(h12 - j12) < 0.1, s"hll jaccard $h12 vs minhash $j12")
  }
}
