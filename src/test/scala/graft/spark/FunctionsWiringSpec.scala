package graft.spark

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.spark.{functions => gf}
import graft.sketch.{Dna, MinHash, OrderMinHash}

/** Catalyst wiring of the round-2 column functions: the pure-JVM algebra is
  * property-tested elsewhere; these assert the Expression plumbing (child
  * ordering, null handling, SQL registration) delivers the same values
  * through a real plan. */
class FunctionsWiringSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("omh_sketch_rc / omh_compare columns match the algebra") {
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val s = "ACGTTGCAACGGTTACGTAGGCATTTACGATCAGGCTAACGGTTAACCGGTA" * 8
    val rc = Dna.reverseComplement(s)
    val df = Seq((s, rc)).toDF("a", "b")
      .select(
        gf.omh_compare(
          gf.omh_sketch(col("a"), 8, 2, 64, 32L),
          gf.omh_sketch_rc(col("a"), 8, 2, 64, 32L),
          gf.omh_sketch(col("b"), 8, 2, 64, 32L),
          8, 2, circular = false).as("sc"),
        gf.omh_similarity(
          gf.omh_sketch(col("a"), 8, 2, 64, 32L),
          gf.omh_sketch(col("b"), 8, 2, 64, 32L)).as("fwd"))
    val r = df.head()
    // rc-aware compare must hit 1.0 on a reverse-strand duplicate
    assert(r.getDouble(0) === 1.0)
    val algebra = OrderMinHash.compareSketches(
      OrderMinHash.sketch(s.getBytes("US-ASCII"), 8, 2, 64, 32L),
      OrderMinHash.sketchRc(s.getBytes("US-ASCII"), 8, 2, 64, 32L),
      OrderMinHash.sketch(rc.getBytes("US-ASCII"), 8, 2, 64, 32L), null,
      8, 2, circular = false)
    assert(r.getDouble(0) === algebra)
    assert(r.getDouble(1) < 1.0) // forward-only does not
    // null propagates
    val n = Seq((Option.empty[String], Option("ACGT"))).toDF("a", "b")
      .select(gf.omh_compare(gf.omh_sketch(col("a"), 4, 2, 8, 1L),
        gf.omh_sketch_rc(col("a"), 4, 2, 8, 1L),
        gf.omh_sketch(col("b"), 4, 2, 8, 1L), 4, 2, circular = true))
      .head()
    assert(n.isNullAt(0))
  }

  test("containment_sketch / contain_jaccard columns match the algebra") {
    import spark.implicits._
    val g = new graft.hash.HashKernels.SplitMix64(7)
    val big = Array.fill(4000)(g.nextLong())
    val sub = big.take(1000)
    val df = Seq((big.toSeq, sub.toSeq)).toDF("big", "sub")
      .select(gf.contain_jaccard(
        gf.containment_sketch(col("sub"), 10),
        gf.containment_sketch(col("big"), 10)).as("cj"))
    val got = df.head().getDouble(0)
    val expect = MinHash.containJaccard(
      MinHash.containmentSketch(sub, 10), MinHash.containmentSketch(big, 10))
    assert(got === expect)
    assert(got > 0.8, s"nested-set containment estimate $got")
  }

  test("first_agree_key: positionwise fast path + cross-band collision fallback") {
    import spark.implicits._
    val df = Seq(
      // positionwise agreement at index 1 wins even though a(0) appears later in b
      (Array(5L, 7L, 9L), Array(6L, 7L, 5L)),
      // NO positionwise agreement: the fallback must find the shared value 9
      // (a cross-band 64-bit key collision — a(2) == b(0)) instead of
      // returning the 0 sentinel and losing the pair's only hot-bucket owner
      (Array(1L, 2L, 9L), Array(9L, 3L, 4L)),
      // fallback scans a in order: first shared value of a, not of b
      (Array(8L, 2L), Array(2L, 8L)),
      // nothing shared -> sentinel
      (Array(1L, 2L), Array(3L, 4L))
    ).toDF("a", "b").select(gf.first_agree_key(col("a"), col("b")))
    assert(df.collect().map(_.getLong(0)).toSeq === Seq(7L, 9L, 8L, 0L))
  }

  test("new functions reachable through registered SQL") {
    graft.spark.functions.registerAll(spark)
    val r = spark.sql(
      """SELECT contain_jaccard(containment_sketch(array(1L,2L,3L,4L), 2),
        |                       containment_sketch(array(1L,2L,3L,4L), 2)) AS cj,
        |       omh_compare(omh_sketch('ACGTACGTACGT', 4, 2, 8, 1),
        |                   omh_sketch_rc('ACGTACGTACGT', 4, 2, 8, 1),
        |                   omh_sketch('ACGTACGTACGT', 4, 2, 8, 1), 4, 2, false) AS oc
        |""".stripMargin).head()
    assert(r.getDouble(0) === 1.0)
    assert(r.getDouble(1) === 1.0)
  }
}
