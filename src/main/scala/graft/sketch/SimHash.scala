package graft.sketch

/** 64-bit SimHash (Charikar random-hyperplane sketch over feature hashes).
  * North_star addition — the reference has no SimHash; semantics follow the
  * published algorithm: each feature votes ±1 on each of the 64 bits of its
  * hash; the sketch bit is 1 iff the vote total is positive.
  */
object SimHash {

  def simhash64(features: Array[Long]): Long = {
    if (features.isEmpty) return 0L
    val votes = new Array[Int](64)
    var i = 0
    while (i < features.length) {
      val h = features(i)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) != 0L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  def simhash64Weighted(features: Array[Long], weights: Array[Double]): Long = {
    require(features.length == weights.length)
    if (features.isEmpty) return 0L
    val votes = new Array[Double](64)
    var i = 0
    while (i < features.length) {
      val h = features(i)
      val w = weights(i)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) != 0L) votes(b) += w else votes(b) -= w
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  @inline def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  /** SimHash LSH block keys: split the 64 bits into `blocks` contiguous
    * chunks; two hashes within hamming distance `blocks-1` share ≥1 key
    * (pigeonhole). Key packs (block index, chunk bits). */
  def blockKeys(h: Long, blocks: Int): Array[Long] = {
    val width = 64 / blocks
    val out = new Array[Long](blocks)
    var i = 0
    while (i < blocks) {
      val chunk = (h >>> (i * width)) & ((1L << width) - 1)
      out(i) = (i.toLong << 56) | chunk
      i += 1
    }
    out
  }
}
