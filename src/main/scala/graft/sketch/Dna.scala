package graft.sketch

import graft.hash.HashKernels

/** DNA-domain kernels — the reference's native input domain, kept so a
  * RabbitSketch user can run their genomic workload unchanged:
  *
  *  - [[reverseComplement]]: table-driven complement via the `(c>>1)&3`
  *    trick (`/root/reference/src/MinHash.cpp:1117-1127`).
  *  - [[canonicalKmerHashes]]: uppercase, slide a k-window, canonical k-mer
  *    = the lexicographically smaller of forward/reverse-complement
  *    (`src/MinHash.cpp:667-670,724-729`), hash with MurmurHash3_x64_128
  *    seed 42 low 64 bits (`src/MinHash.cpp:350-377`) — feeding bottom-k
  *    MinHash ([[MinHash.bottomK]]) or HLL exactly like the reference's
  *    `MinHash::update` / `HyperLogLog::update`.
  *  - [[canonical32merHashes]]: the HLL variant (KMERLEN = 32,
  *    `src/HyperLogLog.cpp:424-426`, note its loop emits length−32 k-mers).
  */
object Dna {

  private val comp: Array[Byte] = {
    val t = new Array[Byte](256)
    val table = Array('T', 'G', 'A', 'C')
    var i = 0
    while (i < 256) { t(i) = table((i >> 1) & 3).toByte; i += 1 }
    t
  }

  /** reference `reverseComplement`: complement via (c>>1)&3 table, reversed. */
  def reverseComplement(seq: Array[Byte]): Array[Byte] = {
    val n = seq.length
    val out = new Array[Byte](n)
    var i = 0
    while (i < n) { out(n - 1 - i) = comp(seq(i) & 0xff); i += 1 }
    out
  }

  def reverseComplement(seq: String): String =
    new String(reverseComplement(seq.getBytes(java.nio.charset.StandardCharsets.US_ASCII)),
      java.nio.charset.StandardCharsets.US_ASCII)

  @inline private def upper(b: Byte): Byte =
    if (b > 96 && b < 123) (b - 32).toByte else b

  /** canonical k-mer murmur3(seed 42) hashes of a sequence (with repeats,
    * in order) — the per-row feature stream of the reference's
    * `MinHash::update`. */
  def canonicalKmerHashes(seq0: Array[Byte], k: Int, seed: Int = 42): Array[Long] = {
    val seq = new Array[Byte](seq0.length)
    var i = 0
    while (i < seq0.length) { seq(i) = upper(seq0(i)); i += 1 }
    val n = seq.length - k + 1
    if (n <= 0) return Array.emptyLongArray
    val rc = reverseComplement(seq)
    val out = new Array[Long](n)
    i = 0
    while (i < n) {
      // forward k-mer at i; its reverse complement is rc[len-i-k, len-i)
      val rcOff = seq.length - i - k
      var cmp = 0
      var j = 0
      while (cmp == 0 && j < k) {
        cmp = (seq(i + j) & 0xff) - (rc(rcOff + j) & 0xff)
        j += 1
      }
      out(i) =
        if (cmp <= 0) HashKernels.murmur3_x64_128(seq, i, k, seed)._1
        else HashKernels.murmur3_x64_128(rc, rcOff, k, seed)._1
      i += 1
    }
    out
  }

  /** HLL feed: canonical 32-mers, loop bound length−KMERLEN as in the
    * reference (`HyperLogLog.cpp:424-444` iterates i < LENGTH-32). */
  def canonical32merHashes(seq: Array[Byte], seed: Int = 42): Array[Long] = {
    val all = canonicalKmerHashes(seq, 32, seed)
    if (all.length <= 1) Array.emptyLongArray
    else java.util.Arrays.copyOf(all, all.length - 1)
  }
}
