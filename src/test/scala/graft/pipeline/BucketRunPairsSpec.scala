package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

/** Pure-JVM property test of the streaming run-walk pair generator: against
  * a brute-force reference over randomized bv-sorted inputs, covering
  * singleton runs, run transitions, the exact-cap boundary, and oversized
  * (skipped) runs. */
class BucketRunPairsSpec extends AnyFunSuite {

  private def brute(rows: Seq[(Long, Long, Long)], maxHamming: Int, cap: Int): Set[(Long, Long)] = {
    rows.groupBy(_._1).valuesIterator.flatMap { run =>
      if (run.size < 2) Nil
      else if (run.size > cap) Seq((Long.MinValue, run.head._1)) // hot marker
      else for {
        (a, i) <- run.zipWithIndex
        b <- run.drop(i + 1)
        if java.lang.Long.bitCount(a._3 ^ b._3) <= maxHamming
      } yield (math.min(a._2, b._2), math.max(a._2, b._2))
    }.toSet
  }

  test("run-walk == brute force over randomized sorted runs (incl. cap boundary)") {
    val rnd = new scala.util.Random(7)
    for (trial <- 0 until 50) {
      val cap = 1 + rnd.nextInt(6) // small caps hit the boundary often
      val nRuns = 1 + rnd.nextInt(8)
      var id = 0L
      val rows = (0 until nRuns).flatMap { r =>
        val runLen = 1 + rnd.nextInt(cap + 3) // spans under, at, and over cap
        (0 until runLen).map { _ =>
          id += 1
          // phashes within hamming 0..8 of zero so the filter both passes
          // and rejects
          (r.toLong, id, rnd.nextLong() & 0xFFL)
        }
      }
      val got = new Dedup.BucketRunPairs(rows.iterator, maxHamming = 3, hotThreshold = cap).toSet
      val want = brute(rows, 3, cap)
      assert(got === want, s"trial=$trial cap=$cap rows=${rows.size}")
    }
  }

  test("empty input and all-singleton input emit nothing") {
    assert(new Dedup.BucketRunPairs(Iterator.empty, 3, 8).isEmpty)
    val singles = (1L to 5L).map(i => (i, i, 0L))
    assert(new Dedup.BucketRunPairs(singles.iterator, 3, 8).isEmpty)
  }
}
