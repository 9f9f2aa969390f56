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
    val out = new java.util.TreeSet[java.lang.Long]()
    val deque = new java.util.ArrayDeque[Int]()
    var i = 0
    while (i < keys.length) {
      val x = HashKernels.wangHash64(keys(i), -1L)
      while (!deque.isEmpty && deque.peekFirst() <= i - w) deque.pollFirst()
      while (!deque.isEmpty && !HashKernels.unsignedLess(
        HashKernels.wangHash64(keys(deque.peekLast()), -1L), x)) deque.pollLast()
      deque.addLast(i)
      if (i >= w - 1) out.add(HashKernels.wangHash64(keys(deque.peekFirst()), -1L))
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
        val strand = if (fwd > rev) rev else fwd // canonical = smaller strand
        val x = (HashKernels.wangHash64(strand, bitmask) << 8) | kmerSpan.toLong
        while (!q.isEmpty && q.peekFirst()._2 <= i - w) q.pollFirst()
        while (!q.isEmpty && q.peekLast()._1 >= x) q.pollLast()
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
