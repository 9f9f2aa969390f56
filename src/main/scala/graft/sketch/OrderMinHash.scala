package graft.sketch

import graft.hash.{HashKernels, MT19937_64}
import graft.hash.HashKernels._

/** Order-preserving MinHash (Marçais et al.), semantics of
  * `/root/reference/src/OrderMinHash.cpp:95-458`:
  *
  *  - per input, list every k-gram occurrence with its per-identity
  *    occurrence counter (weighted multiset; counter joins the hash input so
  *    repeats of a gram get distinct hashes).
  *  - m independent permutations; permutation seeds drawn from
  *    `mt19937_64(seed)` (`OrderMinHash.cpp:190-200`); per occurrence the
  *    permuted value is `fmix64((id + occ) ^ seed_i)`
  *    (`src/hash_int.h:78-87` applied at `OrderMinHash.cpp:308`).
  *  - keep the l unsigned-smallest occurrences per permutation, then sort the
  *    winners by **position** and emit their raw k-gram bytes concatenated
  *    (`OrderMinHash.cpp:398-411`) — order sensitivity lives here.
  *  - similarity = fraction of the m blocks whose l·k bytes are equal
  *    (`OrderMinHash.cpp:443-458`); distance = 1 − similarity.
  *
  * Deviation (documented): k-gram identity is the low 64 bits of
  * murmur3_x64_128 over the k bytes rather than the reference's 2-bit DNA
  * packing (`OrderMinHash.cpp:464-478` is marked "FIXME: not general, only
  * works for DNA"); captions are arbitrary UTF-8.
  */
object OrderMinHash {

  val DefaultK = 4
  val DefaultL = 2
  val DefaultM = 64
  val DefaultSeed = 32L

  /** blocks(i) = the i-th permutation's l winning k-grams (l·k bytes). */
  def sketch(data: Array[Byte], k: Int, l: Int, m: Int, seed: Long): Array[Array[Byte]] = {
    val n = data.length - k + 1
    if (n <= 0) return Array.fill(m)(new Array[Byte](math.max(l, 1) * k))
    val weight = if (l > 0) 1L else 0L
    val ll = math.max(l, 1)

    val ids = new Array[Long](n)
    var i = 0
    while (i < n) { ids(i) = HashKernels.murmur3_x64_128(data, i, k, 42)._1; i += 1 }
    val occ = new Array[Long](n)
    val seen = new java.util.HashMap[java.lang.Long, Int](n * 2)
    i = 0
    while (i < n) {
      val c = seen.merge(ids(i), 1, (a, b) => a + b)
      occ(i) = (c - 1).toLong
      i += 1
    }

    val gen = new MT19937_64(seed)
    val mseed = Array.fill(m)(gen.nextLong())

    val blocks = new Array[Array[Byte]](m)
    // per permutation: bounded "max-heap of the l smallest" — for small l a
    // linear scan over an l-slot buffer is faster than a heap
    val winHash = new Array[Long](ll)
    val winPos = new Array[Int](ll)
    var perm = 0
    while (perm < m) {
      val sd = mseed(perm)
      var size = 0
      var maxIdx = 0
      i = 0
      while (i < n) {
        val h = fmix64((ids(i) + occ(i) * weight) ^ sd)
        if (size < ll) {
          winHash(size) = h; winPos(size) = i
          size += 1
          if (size == ll) {
            maxIdx = 0
            var t = 1
            while (t < ll) { if (unsignedLess(winHash(maxIdx), winHash(t))) maxIdx = t; t += 1 }
          }
        } else if (unsignedLess(h, winHash(maxIdx))) {
          winHash(maxIdx) = h; winPos(maxIdx) = i
          maxIdx = 0
          var t = 1
          while (t < ll) { if (unsignedLess(winHash(maxIdx), winHash(t))) maxIdx = t; t += 1 }
        }
        i += 1
      }
      val order = (0 until size).sortBy(winPos(_))
      val block = new Array[Byte](ll * k)
      var j = 0
      while (j < order.length) {
        System.arraycopy(data, winPos(order(j)), block, j * k, k)
        j += 1
      }
      blocks(perm) = block
      perm += 1
    }
    blocks
  }

  /** sketch of the REVERSE COMPLEMENT strand — the reference's `rcdata`
    * (`/root/reference/src/OrderMinHash.cpp:106-150`: rc mode sketches both
    * `seq` and `reverseComplement(seq)` with the same (k,l,m,seed)). */
  def sketchRc(data: Array[Byte], k: Int, l: Int, m: Int, seed: Long): Array[Array[Byte]] =
    sketch(Dna.reverseComplement(data), k, l, m, seed)

  /** circular block match (`OrderMinHash.cpp:445-458`): block `a` equals a
    * rotation of block `b` by j·k bytes for some j in [0, l). */
  private def blockMatchCircular(a: Array[Byte], b: Array[Byte], k: Int, l: Int): Boolean = {
    val block = a.length
    if (b.length != block) return false
    var j = 0
    while (j < l) {
      val off = j * k
      // a[0, block-off) == b[off, block)  &&  a[block-off, block) == b[0, off)
      if (java.util.Arrays.equals(a, 0, block - off, b, off, block) &&
        java.util.Arrays.equals(a, block - off, block, b, 0, off)) return true
      j += 1
    }
    false
  }

  /** fraction of equal blocks; -1 on shape mismatch like the reference.
    * `circular` enables the rotated-block variant
    * (`OrderMinHash.cpp:445-458`; plain memcmp when l < 2). */
  def similarity(a: Array[Array[Byte]], b: Array[Array[Byte]],
      k: Int, l: Int, circular: Boolean): Double = {
    if (a.length != b.length) return -1.0
    if (a.length == 0) return 0.0
    val rot = circular && l >= 2
    var count = 0
    var i = 0
    while (i < a.length) {
      val eq =
        if (rot) blockMatchCircular(a(i), b(i), k, l)
        else java.util.Arrays.equals(a(i), b(i))
      if (eq) count += 1
      i += 1
    }
    count.toDouble / a.length
  }

  def similarity(a: Array[Array[Byte]], b: Array[Array[Byte]]): Double =
    similarity(a, b, 0, 0, circular = false)

  /** reference `compare_sketches` (`OrderMinHash.cpp:422-443`): forward
    * score, plus — when a reverse-complement sketch exists — the backward
    * score (sk1's rcdata against sk2's data, falling back to sk1's data
    * against sk2's rcdata), returning `max(fwd, bwd)`. */
  def compareSketches(aFwd: Array[Array[Byte]], aRc: Array[Array[Byte]],
      bFwd: Array[Array[Byte]], bRc: Array[Array[Byte]],
      k: Int, l: Int, circular: Boolean): Double = {
    val fwd = similarity(aFwd, bFwd, k, l, circular)
    val bwd =
      if (aRc != null && aRc.nonEmpty) similarity(aRc, bFwd, k, l, circular)
      else if (bRc != null && bRc.nonEmpty) similarity(aFwd, bRc, k, l, circular)
      else 0.0
    math.max(fwd, bwd)
  }

  def distance(a: Array[Array[Byte]], b: Array[Array[Byte]]): Double = 1.0 - similarity(a, b)
}
