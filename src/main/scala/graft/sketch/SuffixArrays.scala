package graft.sketch

/** Suffix-array substring confirmation (north_star: "suffix-array substring
  * pass confirming caption near-dups" — no reference analog; standard
  * prefix-doubling SA construction + Kasai LCP).
  *
  * Pair-local: candidate caption pairs coming out of the LSH join are
  * confirmed by the length of their longest common substring, computed from
  * the suffix array of `a + SEP + b`: the LCS of two strings is the maximum
  * LCP between lexicographically adjacent suffixes originating in different
  * halves.
  */
object SuffixArrays {

  /** suffix array via prefix doubling, O(n log² n); fine for caption-length
    * inputs (pair-local work inside an expression, never dataset-wide). */
  def suffixArray(s: Array[Int]): Array[Int] = {
    val n = s.length
    val sa = Array.tabulate(n)(identity)
    var rank = s.clone()
    var tmp = new Array[Int](n)
    var kLen = 1
    val cmp = (a: Int, b: Int) => {
      if (rank(a) != rank(b)) rank(a) - rank(b)
      else {
        val ra = if (a + kLen < n) rank(a + kLen) else -1
        val rb = if (b + kLen < n) rank(b + kLen) else -1
        ra - rb
      }
    }
    while (kLen < n) {
      val saBoxed = sa.map(Int.box)
      java.util.Arrays.sort(saBoxed, (x: Integer, y: Integer) => cmp(x, y))
      var i = 0
      while (i < n) { sa(i) = saBoxed(i); i += 1 }
      tmp(sa(0)) = 0
      i = 1
      while (i < n) {
        tmp(sa(i)) = tmp(sa(i - 1)) + (if (cmp(sa(i - 1), sa(i)) < 0) 1 else 0)
        i += 1
      }
      val sw = rank; rank = tmp; tmp = sw
      if (rank(sa(n - 1)) == n - 1) kLen = n // all distinct — done
      else kLen <<= 1
    }
    sa
  }

  /** Kasai LCP: lcp(i) = LCP(sa(i), sa(i+1)). */
  def lcpArray(s: Array[Int], sa: Array[Int]): Array[Int] = {
    val n = s.length
    val rank = new Array[Int](n)
    var i = 0
    while (i < n) { rank(sa(i)) = i; i += 1 }
    val lcp = new Array[Int](math.max(n - 1, 0))
    var h = 0
    i = 0
    while (i < n) {
      if (rank(i) + 1 < n) {
        val j = sa(rank(i) + 1)
        while (i + h < n && j + h < n && s(i + h) == s(j + h)) h += 1
        lcp(rank(i)) = h
        if (h > 0) h -= 1
      } else h = 0
      i += 1
    }
    lcp
  }

  /** longest common substring length of `a` and `b` via the suffix array of
    * their sentinel-separated concatenation. */
  def longestCommonSubstring(a: String, b: String): Int = {
    if (a.isEmpty || b.isEmpty) return 0
    val na = a.length
    val n = na + 1 + b.length
    val s = new Array[Int](n)
    var i = 0
    while (i < na) { s(i) = a.charAt(i).toInt + 2; i += 1 }
    s(na) = 1 // sentinel below any char
    i = 0
    while (i < b.length) { s(na + 1 + i) = b.charAt(i).toInt + 2; i += 1 }
    val sa = suffixArray(s)
    val lcp = lcpArray(s, sa)
    var best = 0
    i = 0
    while (i < lcp.length) {
      val p = sa(i)
      val q = sa(i + 1)
      if ((p < na) != (q < na)) { // suffixes from different halves
        if (lcp(i) > best) best = lcp(i)
      }
      i += 1
    }
    best
  }

  /** confirm predicate: LCS ≥ `frac` of the shorter caption (and ≥ minAbs). */
  def lcsConfirm(a: String, b: String, frac: Double, minAbs: Int): Boolean = {
    val shorter = math.min(a.length, b.length)
    if (shorter == 0) return false
    val lcs = longestCommonSubstring(a, b)
    lcs >= minAbs && lcs.toDouble >= frac * shorter
  }
}
