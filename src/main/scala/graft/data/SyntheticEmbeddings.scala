package graft.data

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.hash.HashKernels.splitmix64

/** Deterministic synthetic embedding corpus for the ANN scale proof: `n`
  * unit vectors in `Dim` dimensions drawn around `Centers` planted cluster
  * centers (the regime IVF exists for). Every value is a pure function of
  * (seed, id) via splitmix64 streams — any row can be regenerated on any
  * executor at any parallelism, same contract as [[SyntheticImages]].
  *
  * Schema matches the driver's `embeddings` table where the ANN operators
  * read it: `(vec_id: long, embedding: array<float>)`.
  */
object SyntheticEmbeddings {

  val Dim = 64
  val Centers = 1024
  /** relative noise NORM around the planted unit center (per-dimension
    * sigma = NoiseScale/√Dim, so E‖noise‖ ≈ NoiseScale regardless of Dim):
    * large enough that nearest neighbors are non-trivial (intra-cluster
    * cos ≈ 0.84 ± spread), small enough that clusters exist for IVF lists
    * to capture. Scaling per-dimension instead collapses the structure —
    * ‖noise‖ = 0.45·√64 ≈ 3.6 swamps the unit center and the table becomes
    * i.i.d. random directions, where no ANN index can beat brute force
    * (measured: IVF recall@10 falls from 0.999 to 0.43). */
  val NoiseScale = 0.45

  /** uniform in [0,1) from a splitmix64 draw. */
  @inline private def unit(h: Long): Double = (h >>> 11).toDouble / (1L << 53).toDouble

  /** standard normal via Box-Muller over two splitmix64 draws of a
    * counter-mode stream. */
  @inline private def gauss(stream: Long, i: Int): Double = {
    val u1 = math.max(unit(splitmix64(stream + 2L * i)), 1e-12)
    val u2 = unit(splitmix64(stream + 2L * i + 1))
    math.sqrt(-2.0 * math.log(u1)) * math.cos(2.0 * math.Pi * u2)
  }

  private def normalize(v: Array[Double]): Array[Double] = {
    var s = 0.0; var i = 0
    while (i < v.length) { s += v(i) * v(i); i += 1 }
    val inv = 1.0 / math.sqrt(s)
    i = 0
    while (i < v.length) { v(i) *= inv; i += 1 }
    v
  }

  /** planted unit center `c`. */
  def center(c: Int, seed: Long): Array[Double] = {
    val stream = splitmix64(seed ^ 0x5ee0c0de) + c.toLong * (2L * Dim + 16)
    normalize(Array.tabulate(Dim)(i => gauss(stream, i)))
  }

  /** the row for `id`: cluster = splitmix64-hashed id, vector = unit-norm
    * (center + NoiseScale · gaussian noise), cast to float. */
  def vector(id: Long, seed: Long): Array[Float] = {
    val cid = java.lang.Long.remainderUnsigned(splitmix64(id ^ seed), Centers.toLong).toInt
    val cv = center(cid, seed)
    val stream = splitmix64(seed ^ id) + (1L << 40)
    val sigma = NoiseScale / math.sqrt(Dim)
    val v = Array.tabulate(Dim)(i => cv(i) + sigma * gauss(stream, i))
    normalize(v).map(_.toFloat)
  }

  def path(n: Long): String = s"/root/repo/gendata/embeddings_$n.parquet"

  /** generate (if absent OR generated under a DIFFERENT seed) and return
    * the corpus. The path encodes `n` but not `seed` — without the `_spec`
    * sidecar a seed change would silently serve the old vectors (same
    * stale-cache class [[SyntheticDocs.ensure]] fixes). */
  def ensure(spark: SparkSession, n: Long, seed: Long = 42L): DataFrame = {
    val p = path(n)
    val specFile = new java.io.File(p, "_spec")
    val want = s"seed=$seed"
    val cached =
      if (specFile.isFile)
        new String(java.nio.file.Files.readAllBytes(specFile.toPath), "UTF-8")
      else ""
    if (!new java.io.File(p, "_SUCCESS").exists() || cached != want) {
      import spark.implicits._
      spark.range(0L, n, 1L, 256)
        .map(id => (id, vector(id, seed)))
        .toDF("vec_id", "embedding")
        .write.mode("overwrite").parquet(p)
      java.nio.file.Files.write(specFile.toPath, want.getBytes("UTF-8")): Unit
    }
    spark.read.parquet(p)
  }
}
