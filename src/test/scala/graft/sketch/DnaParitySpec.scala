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
