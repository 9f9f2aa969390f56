package graft.tools

import graft.data.SyntheticImages
import graft.sketch.{MinHash, Shingles, SimHash}

/** dev tool (r6): single-JVM per-kernel split of the signature stage —
  * shingles vs bitgrams vs 128-perm minhash vs simhash vs band keys — on
  * real generated corpus rows. Not part of the driver contract. */
object SigSplit {
  def main(args: Array[String]): Unit = {
    val rows = (0L until 4000L).flatMap(f => SyntheticImages.family(f, 42L, f * 8))
    val caps = rows.map(_.caption.getBytes(java.nio.charset.StandardCharsets.UTF_8)).toArray
    val phashes = rows.map(_.phash).toArray
    val n = caps.length
    println(s"SIG n=$n avg_cap_bytes=${caps.map(_.length).sum / n}")
    val affine = MinHash.permAffine(128, 42L)
    var sink = 0L
    def time(name: String)(f: => Unit): Unit =
      (1 to 3).foreach { _ =>
        val t0 = System.nanoTime()
        f
        val dt = System.nanoTime() - t0
        println(f"SIG $name%-18s ${dt / 1e6}%8.1f ms  ${dt.toDouble / n}%8.0f ns/row")
      }
    // precompute features once for the downstream kernels
    val features = new Array[Array[Long]](n)
    var i = 0
    while (i < n) {
      val sh = Shingles.charShinglesBytes(caps(i), 5)
      val bg = Shingles.phashBitgrams(phashes(i), 16, 4)
      val combined = new Array[Long](bg.length + sh.length)
      System.arraycopy(bg, 0, combined, 0, bg.length)
      System.arraycopy(sh, 0, combined, bg.length, sh.length)
      features(i) = combined
      i += 1
    }
    println(s"SIG avg_features=${features.map(_.length.toLong).sum / n}")
    time("shingles_k5") {
      var j = 0
      while (j < n) { sink ^= Shingles.charShinglesBytes(caps(j), 5).length; j += 1 }
    }
    time("token_ngrams_1") {
      var j = 0
      while (j < n) { sink ^= Shingles.tokenNgramsBytes(caps(j), 1).length; j += 1 }
    }
    time("bitgrams") {
      var j = 0
      while (j < n) { sink ^= Shingles.phashBitgrams(phashes(j), 16, 4)(0); j += 1 }
    }
    println(s"SIG vector_kernel_usable=${MinHash.vectorKernelUsable}")
    time("minhash128") {
      var j = 0
      while (j < n) { sink ^= MinHash.minhashSig(features(j), affine)(0); j += 1 }
    }
    time("minhash128_scalar") {
      var j = 0
      while (j < n) { sink ^= MinHash.minhashSigScalar(features(j), affine)(0); j += 1 }
    }
    time("simhash64") {
      var j = 0
      while (j < n) { sink ^= SimHash.simhash64(features(j)); j += 1 }
    }
    val sigs = features.map(MinHash.minhashSig(_, affine))
    time("band_keys") {
      var j = 0
      while (j < n) { sink ^= MinHash.bandKeys(sigs(j), 32, 4)(0); j += 1 }
    }
    println(s"sink=$sink")
  }
}
