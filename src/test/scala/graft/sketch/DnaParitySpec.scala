package graft.sketch

import org.scalatest.funsuite.AnyFunSuite
import graft.hash.HashKernels.SplitMix64

/** FIXTURES.md §F2 — reference-semantics accuracy on DNA (the reference's
  * native domain): canonical k-mer bottom-k MinHash estimate vs exact
  * jaccard, reverse-complement parity, HLL over canonical 32-mers. */
class DnaParitySpec extends AnyFunSuite {

  def randDna(seed: Long, n: Int): String = {
    val g = new SplitMix64(seed)
    val sb = new StringBuilder(n)
    var i = 0
    while (i < n) { sb.append("ACGT".charAt(((g.nextLong() >>> 1) % 4).toInt)); i += 1 }
    sb.toString
  }

  test("reverseComplement matches reference table semantics") {
    assert(Dna.reverseComplement("ACGT") === "ACGT")
    assert(Dna.reverseComplement("AAAA") === "TTTT")
    assert(Dna.reverseComplement("ACCGGGTTTT") === "AAAACCCGGT")
    // involution
    val s = randDna(3, 500)
    assert(Dna.reverseComplement(Dna.reverseComplement(s)) === s)
  }

  test("canonical k-mer hashes are strand-invariant") {
    val s = randDna(5, 2000)
    val rc = Dna.reverseComplement(s)
    val a = Dna.canonicalKmerHashes(s.getBytes("US-ASCII"), 21)
    val b = Dna.canonicalKmerHashes(rc.getBytes("US-ASCII"), 21)
    assert(a.sorted.toSeq === b.sorted.toSeq)
    // case-insensitive (reference uppercases in place)
    val c = Dna.canonicalKmerHashes(s.toLowerCase.getBytes("US-ASCII"), 21)
    assert(c.toSeq === a.toSeq)
  }

  test("bottom-k MinHash on DNA: estimate within 4/sqrt(s) of exact jaccard (k=21, s=1000)") {
    // pairs_jaccard fixture: base string; second shares a prefix fraction p
    val base = randDna(7, 60000)
    for (keep <- Seq(0.9, 0.5, 0.2)) {
      val n2 = (base.length * keep).toInt
      val other = base.substring(0, n2) + randDna(11 + (keep * 100).toLong, base.length - n2)
      val ka = Dna.canonicalKmerHashes(base.getBytes("US-ASCII"), 21)
      val kb = Dna.canonicalKmerHashes(other.getBytes("US-ASCII"), 21)
      val exact = {
        val sa = ka.toSet
        val sb = kb.toSet
        sa.intersect(sb).size.toDouble / sa.union(sb).size
      }
      val est = MinHash.jaccardBottomK(MinHash.bottomK(ka, 1000), MinHash.bottomK(kb, 1000), 1000)
      assert(math.abs(est - exact) <= 4.0 / math.sqrt(1000.0), s"keep=$keep exact=$exact est=$est")
      // mash distance sanity: monotone in similarity
      assert(MinHash.mashDistance(est, 21) >= 0.0)
    }
  }

  test("OMH rc compare: reverse-strand duplicate scores max(fwd, rc) = 1.0") {
    val s = randDna(17, 4000)
    val rc = Dna.reverseComplement(s)
    // k=8: 4^8 distinct k-mers ≫ sequence length, so unrelated strands share
    // few winners (k=4 would make ANY two long DNA strings score ~0.5: both
    // contain every 4-mer, so the same (id, occ) wins in both and only the
    // position order differs — inherent to the reference's weighted-multiset
    // semantics, not a bug)
    val (k, l, m, seed) = (8, 2, 64, 32L)
    val skS = OrderMinHash.sketch(s.getBytes("US-ASCII"), k, l, m, seed)
    val skRcOfS = OrderMinHash.sketchRc(s.getBytes("US-ASCII"), k, l, m, seed)
    val skOther = OrderMinHash.sketch(rc.getBytes("US-ASCII"), k, l, m, seed)
    // forward-only: a reverse-strand duplicate looks unrelated
    val fwd = OrderMinHash.similarity(skS, skOther)
    assert(fwd < 0.2, s"fwd=$fwd")
    // rc-aware compare_sketches: rcdata of s IS the sketch of rc ⇒ bwd = 1
    val sc = OrderMinHash.compareSketches(skS, skRcOfS, skOther, null, k, l, circular = false)
    assert(sc === 1.0)
    // and the b-side fallback (sk2.rcdata) scores identically
    val sc2 = OrderMinHash.compareSketches(skOther, null, skS, skRcOfS, k, l, circular = false)
    assert(sc2 === 1.0)
    // self-comparison unaffected
    assert(OrderMinHash.compareSketches(skS, skRcOfS, skS, null, k, l, circular = false) === 1.0)
  }

  test("OMH circular compare: rotated blocks match iff circular flag set") {
    val s = randDna(19, 4000)
    val (k, l, m, seed) = (4, 3, 64, 32L)
    val sk = OrderMinHash.sketch(s.getBytes("US-ASCII"), k, l, m, seed)
    // rotate every block by j·k bytes — the exact variant of
    // /root/reference/src/OrderMinHash.cpp:445-458
    for (j <- 1 until l) {
      val rot = sk.map { b =>
        val out = new Array[Byte](b.length)
        System.arraycopy(b, j * k, out, 0, b.length - j * k)
        System.arraycopy(b, 0, out, b.length - j * k, j * k)
        out
      }
      assert(OrderMinHash.similarity(sk, rot, k, l, circular = true) === 1.0, s"j=$j")
      assert(OrderMinHash.similarity(sk, rot, k, l, circular = false) < 0.05, s"j=$j plain")
    }
    // l < 2 degenerates to plain memcmp per the reference
    val sk1 = OrderMinHash.sketch(s.getBytes("US-ASCII"), k, 1, m, seed)
    assert(OrderMinHash.similarity(sk1, sk1, k, 1, circular = true) === 1.0)
    // a circular genome rotation scores at least as high with the flag
    val rotSeq = s.substring(1000) + s.substring(0, 1000)
    val skRot = OrderMinHash.sketch(rotSeq.getBytes("US-ASCII"), k, l, m, seed)
    assert(OrderMinHash.similarity(sk, skRot, k, l, circular = true) >=
      OrderMinHash.similarity(sk, skRot, k, l, circular = false))
  }

  test("HLL over canonical 32-mers: cardinality within tolerance") {
    val s = randDna(13, 120000)
    val kmers = Dna.canonical32merHashes(s.getBytes("US-ASCII"))
    val exact = kmers.toSet.size
    val regs = Hll.init(14)
    kmers.foreach(Hll.add(regs, _, 14))
    val est = Hll.estimate(regs, 14)
    assert(math.abs(est - exact) / exact < 0.05, s"exact=$exact est=$est")
  }
}
