package graft.docs

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DocOpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  lazy val docs = {
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet").cache()
  }

  test("exact dup groups: canon is min id, group sizes consistent") {
    val rows = DocOps.exactDupGroups(docs).collect()
    assert(rows.length === docs.count())
    assert(rows.forall(r => r.getAs[Long]("canon_id") <= r.getAs[Long]("doc_id")))
  }

  test("prefix-filtered ngram join == brute-force all-pairs (lossless pruning)") {
    import spark.implicits._
    val gf = graft.spark.functions
    for (tau <- Seq(0.4, 0.6, 0.8)) {
      val brute = docs.select(col("doc_id"), col("text")).as[(Long, String)].collect()
      val sets = brute.map { case (id, t) => id ->
        graft.sketch.Shingles.tokenNgrams(t, 3).toSet }.filter(_._2.nonEmpty)
      val expect = (for {
        (ia, sa) <- sets; (ib, sb) <- sets
        if ia < ib
        j = sa.intersect(sb).size.toDouble / sa.union(sb).size
        if j >= tau
      } yield (ia, ib)).toSet
      val got = DocOps.ngramDupPairsExact(docs, 3, tau)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got === expect, s"tau=$tau")
    }
  }

  test("minhash LSH pairs == exact ngram pairs at tau 0.6 (recall 1.0 here)") {
    val exact = DocOps.ngramDupPairsExact(docs, 3, 0.6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val mh = DocOps.minhashDupPairs(docs, 3, 0.6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty)
    assert(mh.subsetOf(exact))
    assert(mh.intersect(exact).size.toDouble / exact.size >= 0.99)
  }

  test("simhash pairs: brute-force equivalence of the block-join channel") {
    import spark.implicits._
    val sigs = docs.select(col("doc_id"),
      graft.spark.functions.simhash64(graft.spark.functions.token_ngrams(col("text"), 3)).as("sh"))
      .as[(Long, Long)].collect()
    val brute = (for {
      (ia, sa) <- sigs; (ib, sb) <- sigs
      if ia < ib && java.lang.Long.bitCount(sa ^ sb) <= 3
    } yield (ia, ib)).toSet
    val got = DocOps.simhashDupPairs(docs, 3, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === brute)
  }

  test("planted boilerplate hot bucket: minhash channel pair set invariant under salting") {
    // the 100-TB text regime the verdict flagged: boilerplate puts hundreds
    // of near-identical docs into ONE band bucket. hotThreshold=32 forces
    // every boilerplate bucket through the terminal salt-and-replicate path;
    // the pair set must equal both the unsalted walk and brute-force jaccard
    // (mirrors SaltingSpec on the image side).
    import spark.implicits._
    val boiler = "terms of service apply to all users and all content on this site always"
    val hot = (0 until 150).map(i => (i.toLong, boiler))
    val churn = (150 until 180).map(i => (i.toLong, boiler + s" extra${i % 3}"))
    val g = new scala.util.Random(11)
    val cold = (200 until 240).map(i =>
      (i.toLong, (0 until 14).map(_ => s"w${g.nextInt(5000)}").mkString(" ")))
    val all = hot ++ churn ++ cold
    val d = all.toDF("doc_id", "text")
    val salted = DocOps.minhashDupPairs(d, 3, 0.6, hotThreshold = 32, saltChunks = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val unsalted = DocOps.minhashDupPairs(d, 3, 0.6, hotThreshold = 1 << 20)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val sets = all.map { case (id, t) =>
      id -> graft.sketch.Shingles.tokenNgrams(t, 3).toSet }.filter(_._2.nonEmpty)
    val brute = (for {
      (ia, sa) <- sets; (ib, sb) <- sets
      if ia < ib
      j = sa.intersect(sb).size.toDouble / sa.union(sb).size
      if j >= 0.6
    } yield (ia, ib)).toSet
    assert(brute.size >= 150 * 149 / 2) // the boilerplate block is really pair-dense
    assert(salted === unsalted,
      s"salting diff: missing=${(unsalted -- salted).size} extra=${(salted -- unsalted).size}")
    // LSH recall on identical/near-identical docs is 1.0: every pair here
    // shares whole bands, so the walk output must equal brute force exactly
    assert(salted === brute,
      s"vs brute: missing=${(brute -- salted).size} extra=${(salted -- brute).size}")
  }

  test("first-agreeing-band dedup: candidate set identical, hot path forced") {
    // mega-cluster hot in EVERY band plus churn members whose pairs
    // first-agree at varying band indexes, plus cold clusters whose pairs
    // the streaming walk (not the dense join) must still emit — the
    // losslessness claim of the dedup-at-source join, gated directly
    // against the per-bucket-emission control
    import spark.implicits._
    val boiler = "cookie policy banner text repeated on every page of the site forever"
    val hot = (0 until 120).map(i => (i.toLong, boiler))
    val churn = (120 until 170).map(i => (i.toLong, boiler + s" tail${i % 7}"))
    val g = new scala.util.Random(23)
    val cold = (0 until 15).flatMap { c =>
      val base = (0 until 14).map(_ => s"w${g.nextInt(5000)}").mkString(" ")
      Seq((300L + 2 * c, base), (301L + 2 * c, base + " zz"))
    }
    val d = (hot ++ churn ++ cold).toDF("doc_id", "text")
    def pairs(firstAgree: Boolean) =
      DocOps.minhashCandidates(d, 3, hotThreshold = 16, saltChunks = 4,
          firstAgreeDedup = firstAgree)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val per = pairs(firstAgree = false)
    val fa = pairs(firstAgree = true)
    assert(per.size > (120 * 119) / 2) // the hot fan-out really engaged
    assert(fa === per,
      s"first-agree diff: missing=${(per -- fa).size} extra=${(fa -- per).size}")
  }

  test("planted boilerplate hot bucket: simhash channel == brute force under salting") {
    import spark.implicits._
    val boiler = "all rights reserved contact the administrator for removal requests today"
    val hot = (0 until 120).map(i => (i.toLong, boiler))
    val g = new scala.util.Random(13)
    val cold = (200 until 260).map(i =>
      (i.toLong, (0 until 14).map(_ => s"w${g.nextInt(5000)}").mkString(" ")))
    val d = (hot ++ cold).toDF("doc_id", "text")
    val sigs = d.select(col("doc_id"),
      graft.spark.functions.simhash64(graft.spark.functions.token_ngrams(col("text"), 3)).as("sh"))
      .as[(Long, Long)].collect()
    val brute = (for {
      (ia, sa) <- sigs; (ib, sb) <- sigs
      if ia < ib && java.lang.Long.bitCount(sa ^ sb) <= 3
    } yield (ia, ib)).toSet
    val salted = DocOps.simhashDupPairs(d, 3, 3, hotThreshold = 32, saltChunks = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(brute.size >= 120 * 119 / 2)
    assert(salted === brute,
      s"vs brute: missing=${(brute -- salted).size} extra=${(salted -- brute).size}")
  }

  test("md5 twins: pair sets invariant under forced hot-bucket salting") {
    import spark.implicits._
    val boiler = "standard license text shared verbatim across the corpus for testing"
    val hot = (0 until 100).map(i => (i.toLong, boiler))
    val g = new scala.util.Random(17)
    val cold = (200 until 240).map(i =>
      (i.toLong, (0 until 12).map(_ => s"w${g.nextInt(5000)}").mkString(" ")))
    val d = (hot ++ cold).toDF("doc_id", "text")
    val mh = graft.oracle.Md5Channels
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs(mh.docMinhashDupPairsMd5(d, hotThreshold = 32, saltChunks = 4))
      === pairs(mh.docMinhashDupPairsMd5(d, hotThreshold = 1 << 12)))
    assert(pairs(mh.docSimhashDupPairsMd5(d, hotThreshold = 32, saltChunks = 4))
      === pairs(mh.docSimhashDupPairsMd5(d, hotThreshold = 1 << 20)))
  }

  test("language id: detects natural-language samples, und for noise") {
    import spark.implicits._
    val samples = Seq(
      (1L, "the quick brown fox is happy and it runs to the forest in the morning"),
      (2L, "le chat est dans la maison et il mange une pomme avec les enfants"),
      (3L, "el perro es grande y la casa de los abuelos es muy bonita que si"),
      (4L, "der hund ist gross und die katze ist nicht von der strasse ein tier"),
      (5L, "这是 一个 中文 句子"),
      (6L, "zxqv kjhw pqmx uvtr")).toDF("doc_id", "text")
    val got = DocOps.langId(samples).collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) === "en")
    assert(got(2L) === "fr")
    assert(got(3L) === "es")
    assert(got(4L) === "de")
    assert(got(5L) === "zh")
    assert(got(6L) === "und")
  }

  test("fingerprints: deterministic, shared between near-dup docs") {
    val fp1 = DocOps.fingerprints(docs).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val fp2 = DocOps.fingerprints(docs).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(fp1 === fp2)
    // near-dup docs (from the exact pair list) share most fingerprints
    val pairs = DocOps.ngramDupPairsExact(docs, 3, 0.6).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val byDoc = fp1.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val shares = pairs.map { case (a, b) =>
      val fa = byDoc.getOrElse(a, Set.empty)
      val fb = byDoc.getOrElse(b, Set.empty)
      fa.intersect(fb).size.toDouble / math.max(1, math.min(fa.size, fb.size))
    }
    assert(shares.nonEmpty && shares.sum / shares.length > 0.5,
      s"avg fingerprint overlap ${shares.sum / shares.length}")
  }

  test("hll token counts within 2% of exact per source") {
    val exact = DocOps.distinctTokensBySource(docs).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val est = DocOps.hllTokensBySource(docs, 14).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    for ((src, n) <- exact) {
      assert(math.abs(est(src) - n) / n < 0.02, s"$src exact=$n est=${est(src)}")
    }
  }

  test("doc_stats quality score bounded and fields consistent") {
    val rows = DocOps.docStats(docs).collect()
    assert(rows.forall { r =>
      val q = r.getAs[Double]("quality")
      q >= 0 && q <= 1.0 &&
        r.getAs[Long]("n_distinct") <= r.getAs[Long]("n_tokens")
    })
  }

  test("hll joint-MLE gated against the oracle-exact per-pair set counts") {
    // the estimator-suite driver query is rows-only (estimates), so its HLL
    // columns are gated HERE against the md5 channel's exact companions
    // (n_distinct_a/b, n_inter — themselves rows+schema+hash oracle-gated):
    // per candidate pair, Ertl joint-MLE jaccard and intersection over HLL
    // sketches of the SAME char-8 shingle sets must track the exact values.
    import graft.sketch.Hll
    import graft.hash.HashKernels
    val pairs = DocOps.ngramDupPairsExact(docs, 3, 0.4)
    val est = graft.oracle.Md5Channels.docSketchEstimatesMd5(docs, pairs).collect()
    assert(est.nonEmpty)
    val texts = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val np = 12
    def sketch(text: String): Array[Byte] = {
      val regs = Hll.init(np)
      text.sliding(8).toSet[String].foreach { sh =>
        Hll.add(regs, HashKernels.murmur3_low64(sh, 42), np)
      }
      regs
    }
    var absErr = 0.0
    est.foreach { r =>
      val na = r.getAs[Long]("n_distinct_a").toDouble
      val nb = r.getAs[Long]("n_distinct_b").toDouble
      val ni = r.getAs[Long]("n_inter").toDouble
      val exactJ = ni / (na + nb - ni)
      val ha = sketch(texts(r.getAs[Long]("id_a")))
      val hb = sketch(texts(r.getAs[Long]("id_b")))
      val mleJ = Hll.jaccardMle(ha, hb, np)
      assert(math.abs(mleJ - exactJ) <= 0.08,
        s"pair ${r.getLong(0)},${r.getLong(1)}: mleJ=$mleJ exactJ=$exactJ")
      val (_, _, interEst) = Hll.jointMle(ha, hb, np)
      assert(math.abs(interEst - ni) <= math.max(8.0, 0.15 * ni),
        s"pair ${r.getLong(0)},${r.getLong(1)}: interEst=$interEst exact=$ni")
      absErr += math.abs(mleJ - exactJ)
    }
    assert(absErr / est.length <= 0.03, s"mean |mleJ-exactJ| = ${absErr / est.length}")
  }
}
