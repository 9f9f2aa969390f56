package graft.sketch

import graft.hash.HashKernels

/** Feature extraction: text shingling and pHash bit-grams.
  *
  * The reference shingles DNA into k-mers before hashing
  * (`/root/reference/src/MinHash.cpp:465-746`); our domain (north_star) is
  * image pHashes + captions, so the analogous narrow per-row stage produces:
  *  - character k-shingle hashes of the caption (murmur3 low64, seed 42 — the
  *    reference's hash/seed, `src/MinHash.cpp:350-377`),
  *  - word n-gram hashes,
  *  - pHash bit-grams: overlapping bit-windows of the 64-bit perceptual hash,
  *    position-tagged, so Hamming-close pHashes share most features.
  */
object Shingles {

  private val Utf8 = java.nio.charset.StandardCharsets.UTF_8

  /** distinct character k-shingle hashes (unsigned-sorted for determinism).
    * Allocation-light: one primitive array + in-place sort-dedup (no boxed
    * HashSet) — this runs once per row on the hottest narrow stage. */
  def charShingles(text: String, k: Int, seed: Int = 42): Array[Long] = {
    if (text == null || text.length < k) return Array.emptyLongArray
    val bytes = text.getBytes(Utf8)
    if (bytes.length < k) return Array.emptyLongArray
    val n = bytes.length - k + 1
    val hs = new Array[Long](n)
    var i = 0
    while (i < n) {
      hs(i) = HashKernels.murmur3_x64_128(bytes, i, k, seed)._1
      i += 1
    }
    sortDedupUnsigned(hs)
  }

  @inline private def isAsciiOnly(bytes: Array[Byte]): Boolean = {
    var i = 0
    while (i < bytes.length) { if (bytes(i) < 0) return false; i += 1 }
    true
  }

  /** [[charShingles]] over the raw UTF-8 bytes (the UTF8String fast path —
    * skips the toString decode + getBytes re-encode the String entry pays).
    * ASCII-only fast path: there byte length == UTF-16 length, so the
    * `text.length < k` guard coincides and the shingle windows are the same
    * bytes; any non-ASCII byte falls back to the String path, which keeps
    * the output bit-identical on every input (r6 optimization). */
  def charShinglesBytes(bytes: Array[Byte], k: Int, seed: Int = 42): Array[Long] = {
    if (bytes == null || bytes.length < k) return Array.emptyLongArray
    if (!isAsciiOnly(bytes)) return charShingles(new String(bytes, Utf8), k, seed)
    val n = bytes.length - k + 1
    val hs = new Array[Long](n)
    var i = 0
    while (i < n) {
      hs(i) = HashKernels.murmur3_x64_128(bytes, i, k, seed)._1
      i += 1
    }
    sortDedupUnsigned(hs)
  }

  @inline private def isWsByte(b: Byte): Boolean =
    b == ' '.toByte || b == '\t'.toByte || b == '\n'.toByte ||
      b == 0x0B.toByte || b == '\f'.toByte || b == '\r'.toByte

  /** [[tokenNgrams]] over the raw UTF-8 bytes. ASCII-only fast path: Java's
    * `\s` is the ASCII class [ \t\n\x0B\f\r], and ASCII bytes never occur
    * inside multi-byte UTF-8 sequences, so byte-level splitting equals the
    * regex split; grams are hashed from a single-space-joined normalized
    * buffer whose slices are byte-identical to the gram strings' UTF-8.
    * Non-ASCII input falls back to the String path (r6 optimization). */
  def tokenNgramsBytes(bytes: Array[Byte], n: Int, seed: Int = 42): Array[Long] = {
    if (bytes == null) return Array.emptyLongArray
    if (!isAsciiOnly(bytes)) return tokenNgrams(new String(bytes, Utf8), n, seed)
    val len = bytes.length
    // normalized single-space-joined token buffer + per-token start offsets
    val norm = new Array[Byte](len)
    val starts = new Array[Int](len / 2 + 2)
    var nl = 0
    var nt = 0
    var i = 0
    while (i < len) {
      while (i < len && isWsByte(bytes(i))) i += 1
      if (i < len) {
        if (nt > 0) { norm(nl) = ' '; nl += 1 }
        starts(nt) = nl
        while (i < len && !isWsByte(bytes(i))) { norm(nl) = bytes(i); nl += 1; i += 1 }
        nt += 1
      }
    }
    if (nt < n) return Array.emptyLongArray
    starts(nt) = nl + 1 // sentinel: end(t) = starts(t+1) - 1
    val m = nt - n + 1
    val hs = new Array[Long](m)
    i = 0
    while (i < m) {
      val s = starts(i)
      val e = starts(i + n) - 1
      hs(i) = HashKernels.murmur3_x64_128(norm, s, e - s, seed)._1
      i += 1
    }
    sortDedupUnsigned(hs)
  }

  /** distinct word n-gram hashes over whitespace tokens. */
  def tokenNgrams(text: String, n: Int, seed: Int = 42): Array[Long] = {
    if (text == null) return Array.emptyLongArray
    val tokens = text.split("\\s+").filter(_.nonEmpty)
    if (tokens.length < n) return Array.emptyLongArray
    val m = tokens.length - n + 1
    val hs = new Array[Long](m)
    var i = 0
    while (i < m) {
      val gram =
        if (n == 1) tokens(i).getBytes(Utf8)
        else {
          val sb = new java.lang.StringBuilder(tokens(i))
          var j = 1
          while (j < n) { sb.append(' ').append(tokens(i + j)); j += 1 }
          sb.toString.getBytes(Utf8)
        }
      hs(i) = HashKernels.murmur3_x64_128(gram, 0, gram.length, seed)._1
      i += 1
    }
    sortDedupUnsigned(hs)
  }

  /** in-place unsigned sort + dedup. */
  private def sortDedupUnsigned(hs: Array[Long]): Array[Long] = {
    var i = 0
    while (i < hs.length) { hs(i) = HashKernels.unsignedSortKey(hs(i)); i += 1 }
    java.util.Arrays.sort(hs)
    var n = 0
    i = 0
    while (i < hs.length) {
      if (n == 0 || hs(i) != hs(n - 1)) { hs(n) = hs(i); n += 1 }
      i += 1
    }
    i = 0
    while (i < n) { hs(i) = hs(i) ^ Long.MinValue; i += 1 }
    if (n == hs.length) hs else java.util.Arrays.copyOf(hs, n)
  }

  /** pHash bit-gram features: `64/step` overlapping windows of `gram` bits
    * (wrapping), each tagged with its offset then mixed. A single flipped
    * bit corrupts at most `gram/step` of the `64/step` features. */
  def phashBitgrams(phash: Long, gram: Int = 16, step: Int = 4): Array[Long] = {
    val n = 64 / step
    val mask = if (gram >= 64) -1L else (1L << gram) - 1
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      val window = java.lang.Long.rotateRight(phash, i * step) & mask
      out(i) = HashKernels.fmix64Seeded(window, 0x5bd1e995L * (i + 1))
      i += 1
    }
    out
  }
}
