package graft.sketch

import graft.hash.HashKernels

/** Sliding-window minimizers (monotonic-deque window minimum), semantics of
  * `/root/reference/src/histoSketch.cpp:51-216`:
  *
  *  - each position's key is an invertible Wang `hash64` of the canonical
  *    k-mer under mask 2^(2k)−1, tagged with the k-mer span in the low byte
  *    (`histoSketch.cpp:158`: x = hash64(kmer) << 8 | span);
  *  - a monotonic deque keeps the current window's minimum in O(1) amortized
  *    (`histoSketch.cpp:164-182`);
  *  - the per-sequence output is the **distinct set** of window minima
  *    (reference accumulates into a hash map, `histoSketch.cpp:196`).
  *
  * [[dnaMinimizers]] reproduces the DNA path (2-bit pack, canonical strand,
  * symmetric-k-mer skip) for parity fixtures; [[minimizers]] is the general
  * form over an arbitrary pre-hashed feature stream (caption shingles).
  */
object Minimizers {

  /** general minimizer set over a stream of 64-bit feature keys. */
  def minimizers(keys: Array[Long], w: Int): Array[Long] = {
    if (keys.isEmpty) return Array.emptyLongArray
    // hash each key ONCE into a parallel array: the deque re-reads a
    // position's hash on every pop-comparison and window emission (up to
    // O(w) times per element on the doc_fingerprints per-row hot path), so
    // recomputing the ~20-op wang hash there dominated the walk
    val hs = new Array[Long](keys.length)
    var i = 0
    while (i < keys.length) { hs(i) = HashKernels.wangHash64(keys(i), -1L); i += 1 }
    val out = new java.util.TreeSet[java.lang.Long]()
    val deque = new java.util.ArrayDeque[Int]()
    i = 0
    while (i < keys.length) {
      val x = hs(i)
      while (!deque.isEmpty && deque.peekFirst() <= i - w) deque.pollFirst()
      while (!deque.isEmpty && !HashKernels.unsignedLess(hs(deque.peekLast()), x)) deque.pollLast()
      deque.addLast(i)
      if (i >= w - 1) out.add(hs(deque.peekFirst()))
      i += 1
    }
    if (out.isEmpty && keys.nonEmpty) {
      // sequence shorter than one full window: reference returns nothing;
      // we keep that contract (empty set)
    }
    val res = new Array[Long](out.size())
    val it = out.iterator()
    var j = 0
    while (it.hasNext) { res(j) = it.next(); j += 1 }
    res
  }

  private val nt4 = {
    val t = Array.fill[Byte](256)(4)
    t('A') = 0; t('a') = 0
    t('C') = 1; t('c') = 1
    t('G') = 2; t('g') = 2
    t('T') = 3; t('t') = 3; t('U') = 3; t('u') = 3
    t
  }

  /** DNA minimizer set — parity with reference `findMinimizers`. */
  def dnaMinimizers(s: String, k: Int, w: Int): Array[Long] = {
    require(k > 0 && k < 32, "k must be in (0, 32)")
    val len = s.length
    if (len < 1 || len < w + k - 1) return Array.emptyLongArray
    var fwd = 0L
    var rev = 0L
    val bitmask = (1L << (2 * k)) - 1
    val bitshift = 2L * (k - 1)
    val q = new java.util.ArrayDeque[(Long, Int)]() // (key X, position Y)
    val out = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < len) {
      val windowIndex = i - w + 1
      val c = nt4(s.charAt(i) & 0xff).toLong
      val kmerSpan = if (windowIndex + 1 < k) windowIndex + 1 else k
      fwd = ((fwd << 2) | c) & bitmask
      rev = (rev >>> 2) | ((3L ^ c) << bitshift)
      if (i >= k - 1 && fwd != rev) {
        // canonical = smaller strand — UNSIGNED, like the reference's
        // uint64 compare (for k ≤ 31 both strands fit 62 bits, so signed
        // and unsigned agree here; spelled out for parity)
        val strand = if (java.lang.Long.compareUnsigned(fwd, rev) > 0) rev else fwd
        // reference: x = hash64(kmer, mask) << 8 | (uint64_t)kmerSpan
        // (histoSketch.cpp:156). A negative kmerSpan (early positions of a
        // w > k window) sign-extends to the SAME bit pattern the C++ cast
        // produces: a huge uint64 that must never win a window — hence the
        // deque ordering below must be UNSIGNED like the reference's, or
        // those sentinel-like keys would signed-compare as the smallest
        // value and flood the minimizer set
        val x = (HashKernels.wangHash64(strand, bitmask) << 8) | kmerSpan.toLong
        while (!q.isEmpty && q.peekFirst()._2 <= i - w) q.pollFirst()
        while (!q.isEmpty && !HashKernels.unsignedLess(q.peekLast()._1, x)) q.pollLast()
        q.addLast((x, i))
        if (windowIndex >= 0) out.add(q.peekFirst()._1)
      }
      i += 1
    }
    val res = new Array[Long](out.size())
    val it = out.iterator()
    var j = 0
    while (it.hasNext) { res(j) = it.next(); j += 1 }
    res
  }

  /** bin a minimizer set into a frequency spectrum over `numBins` buckets via
    * jump consistent hashing (reference `kmerSpectrumAddHash`,
    * `histoSketch.cpp:229-243`). Returns (binId, frequency) pairs for
    * non-empty bins, ordered by binId (reference dumps in bin order,
    * `histoSketch.cpp:245-256`). */
  def kmerSpectrum(minimizerSet: Array[Long], numBins: Int): Array[(Int, Double)] = {
    val m = new java.util.TreeMap[Int, Double]()
    var i = 0
    while (i < minimizerSet.length) {
      val bin = HashKernels.jumpConsistentHash(minimizerSet(i), numBins)
      m.merge(bin, 1.0, (a, b) => a + b)
      i += 1
    }
    val out = new Array[(Int, Double)](m.size())
    val it = m.entrySet().iterator()
    var j = 0
    while (it.hasNext) { val e = it.next(); out(j) = (e.getKey, e.getValue); j += 1 }
    out
  }
}
