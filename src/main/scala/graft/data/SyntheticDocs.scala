package graft.data

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.hash.HashKernels.splitmix64

/** Deterministic synthetic DOCUMENT corpus for the boilerplate-skew scale
  * experiments (BENCH/SCALE.md `docskew` section) — the text-side analog of
  * [[SyntheticImages]]. Three populations model the 100-TB web regime the
  * round-3 verdict flagged for the doc LSH channels:
  *
  *  - `megaTemplates` boilerplate templates with `megaMembers` near-identical
  *    members each (2 of ~40 tokens perturbed per member, pairwise token
  *    3-gram jaccard ≈ 0.7-0.9 ≥ tau): every band bucket of such a template
  *    grows ∝ corpus share — the hot-bucket regime;
  *  - `smallClusters` clusters of `smallMembers` near-dup docs (1 token
  *    perturbed): the cold long tail the streaming walk handles in-loop;
  *  - `noise` singleton docs of random tokens from a 5M-token vocabulary
  *    (near-zero pairwise similarity, singleton buckets).
  *
  * All text derives from splitmix64 streams keyed by doc id — identical at
  * any parallelism, regenerable from the seed, no external data.
  */
object SyntheticDocs {

  final case class Spec(
      megaTemplates: Int = 2, megaMembers: Int = 3000,
      smallClusters: Int = 20000, smallMembers: Int = 6,
      noise: Int = 1000000, seed: Long = 7L) {
    def rows: Long =
      megaTemplates.toLong * megaMembers + smallClusters.toLong * smallMembers + noise
  }

  private val TemplateTokens = 40
  private val NoiseTokens = 14

  private def tok(h: Long): String = s"t${(h >>> 40) % 5000000L}"

  /** template token stream for cluster `cid` (shared by all its members). */
  private def templateTok(seed: Long, cid: Long, pos: Int): String =
    tok(splitmix64(seed ^ 0x7e57ab1e00L ^ (cid * 131071L + pos)))

  /** one document's text. Population layout by global id:
    * [0, mega) template members; [mega, mega+small) small-cluster members;
    * rest noise. */
  def text(spec: Spec, id: Long): String = {
    val megaN = spec.megaTemplates.toLong * spec.megaMembers
    val smallN = spec.smallClusters.toLong * spec.smallMembers
    if (id < megaN) {
      val cid = id / spec.megaMembers
      // perturb 2 deterministic positions per member: pairwise jaccard of
      // the 3-gram sets stays well above 0.6 while band keys vary enough
      // that first-agreement spreads across bands
      val p1 = ((splitmix64(spec.seed ^ id) >>> 33) % TemplateTokens).toInt
      val p2 = ((splitmix64(spec.seed ^ (id + 0x5ca1ab1eL)) >>> 33) % TemplateTokens).toInt
      (0 until TemplateTokens).map { p =>
        if (p == p1 || p == p2) tok(splitmix64(spec.seed ^ 0xed17ed17L ^ (id * 64 + p)))
        else templateTok(spec.seed, cid, p)
      }.mkString(" ")
    } else if (id < megaN + smallN) {
      val cid = spec.megaTemplates + (id - megaN) / spec.smallMembers
      val p1 = ((splitmix64(spec.seed ^ id) >>> 33) % TemplateTokens).toInt
      (0 until TemplateTokens).map { p =>
        if (p == p1) tok(splitmix64(spec.seed ^ 0xed17ed17L ^ (id * 64 + p)))
        else templateTok(spec.seed, cid, p)
      }.mkString(" ")
    } else {
      (0 until NoiseTokens)
        .map(p => tok(splitmix64(spec.seed ^ 0x4015eL ^ (id * 64 + p))))
        .mkString(" ")
    }
  }

  def path(name: String): String = s"/root/repo/gendata/docs_$name.parquet"

  /** generate (if absent OR generated from a DIFFERENT spec) and return the
    * corpus as (doc_id, text). The cache key is the name PLUS a `_spec`
    * sidecar recording the generating Spec: without it, changing Spec
    * defaults would silently serve the old corpus while reports interpolate
    * the new spec values — a measurement that misdescribes its own input. */
  def ensure(spark: SparkSession, name: String, spec: Spec = Spec()): DataFrame = {
    val p = path(name)
    val done = new java.io.File(p, "_SUCCESS")
    val specFile = new java.io.File(p, "_spec")
    val want = spec.toString
    val cachedSpec =
      if (specFile.isFile)
        new String(java.nio.file.Files.readAllBytes(specFile.toPath), "UTF-8")
      else ""
    if (!done.exists() || cachedSpec != want) {
      import spark.implicits._
      spark.range(0, spec.rows, 1, 64)
        .map(id => (id.toLong, text(spec, id)))
        .toDF("doc_id", "text")
        .write.mode("overwrite").parquet(p)
      java.nio.file.Files.write(specFile.toPath, want.getBytes("UTF-8")): Unit
    }
    spark.read.parquet(p)
  }
}
