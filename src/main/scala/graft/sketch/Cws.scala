package graft.sketch

import graft.hash.HashKernels
import graft.hash.HashKernels.SplitMix64

/** Consistent Weighted Sampling / HistoSketch (= the reference's
  * WeightedMinHash, `/root/reference/src/WeightedMinHash.cpp` +
  * `src/histoSketch.cpp:271-395`):
  *
  *  - a weighted histogram (bin → frequency) is sketched into `sketchSize`
  *    slots; slot j keeps the bin minimizing a_ka = c/(y·exp(r)) with
  *    y = exp(ln f − c·b) where (r, c, b) are CWS draws
  *    (`histoSketch.cpp:308-357`): r ~ Gamma(2,1), c = ln Gamma(2,1),
  *    b = U(0,1)·r (`histoSketch.cpp:12-23`).
  *  - frequencies are first smoothed through a count-min sketch with
  *    d = ⌈log(1−DELTA)/log 0.5⌉ = 7 rows × g = ⌈2/EPSILON⌉ = 2000 cols
  *    (`histoSketch.h:12-13`, `histoSketch.cpp:271-304`), row-i key
  *    = element + i·element, column = JumpConsistentHash(key, g).
  *  - weighted jaccard of two sketches: slot-equal → min/max of weights into
  *    ∩/∪, else max into ∪ (`WeightedMinHash.cpp:58-109`).
  *
  * Determinism note (SURVEY §7.4): libstdc++'s gamma_distribution draw
  * sequence is not a portable spec, so bit-parity with the C++ draws is not
  * meaningful; we fix our own documented generator — splitmix64 uniforms with
  * Gamma(2,1) = Exp(1)+Exp(1) = −ln(u₁u₂) — and test distributional accuracy.
  */
object Cws {

  final val CountMinG = 2000 // ceil(2 / 0.001)
  final val CountMinD = 7    // ceil(log(1-0.99)/log(0.5))

  case class Draws(r: Array[Double], c: Array[Double], b: Array[Double], sketchSize: Int, dim: Int)

  /** deterministic CWS parameter draws; layout r(j*dim + i), j = slot, i = bin. */
  def genDraws(sketchSize: Int, dim: Int, seed: Long = 1L): Draws = {
    val g = new SplitMix64(seed)
    val n = sketchSize * dim
    val r = new Array[Double](n)
    val c = new Array[Double](n)
    val b = new Array[Double](n)
    var i = 0
    while (i < n) {
      def gamma21(): Double = {
        var u1 = g.nextDouble(); if (u1 <= 0.0) u1 = java.lang.Double.MIN_VALUE
        var u2 = g.nextDouble(); if (u2 <= 0.0) u2 = java.lang.Double.MIN_VALUE
        -math.log(u1 * u2)
      }
      r(i) = gamma21()
      c(i) = math.log(gamma21())
      b(i) = g.nextDouble() * r(i)
      i += 1
    }
    Draws(r, c, b, sketchSize, dim)
  }

  /** count-min add returning the min estimate (reference `countMinAdd`). */
  def countMinAdd(cm: Array[Double], element: Long, increment: Double): Double = {
    var currentMin = Double.MaxValue
    var i = 0
    while (i < CountMinD) {
      val hash = element + i.toLong * element
      val j = HashKernels.jumpConsistentHash(hash, CountMinG)
      if (increment != 0.0) cm(i * CountMinG + j) += increment
      if (cm(i * CountMinG + j) < currentMin) currentMin = cm(i * CountMinG + j)
      i += 1
    }
    currentMin
  }

  /** sketch a (binId → frequency) histogram. Returns (slots, slotWeights). */
  def cwsSketch(spectrum: Iterator[(Int, Double)], draws: Draws): (Array[Int], Array[Double]) = {
    val s = draws.sketchSize
    val dim = draws.dim
    val cm = new Array[Double](CountMinD * CountMinG)
    val slots = new Array[Int](s)
    val weights = Array.fill(s)(Double.MaxValue)
    spectrum.foreach { case (bin, freq) =>
      val estiFreq = countMinAdd(cm, bin.toLong, freq)
      val lnF = math.log(estiFreq)
      var j = 0
      while (j < s) {
        val idx = j * dim + bin
        val yka = math.exp(lnF - draws.c(idx) * draws.b(idx))
        val aka = draws.c(idx) / (yka * math.exp(draws.r(idx)))
        if (aka < weights(j)) { slots(j) = bin; weights(j) = aka }
        j += 1
      }
    }
    (slots, weights)
  }

  /** positionwise weighted jaccard (reference `wJaccard`). */
  def weightedJaccard(sa: Array[Int], wa: Array[Double], sb: Array[Int], wb: Array[Double]): Double = {
    require(sa.length == sb.length && wa.length == wb.length && sa.length == wa.length)
    var inter = 0.0
    var union = 0.0
    var i = 0
    while (i < sa.length) {
      val cwa = math.abs(wa(i))
      val cwb = math.abs(wb(i))
      if (sa(i) == sb(i)) {
        if (cwa < cwb) { inter += cwa; union += cwb }
        else { inter += cwb; union += cwa }
      } else {
        union += math.max(cwa, cwb)
      }
      i += 1
    }
    if (union == 0.0) 0.0 else inter / union
  }

  def weightedJaccardDistance(sa: Array[Int], wa: Array[Double], sb: Array[Int], wb: Array[Double]): Double =
    1.0 - weightedJaccard(sa, wa, sb, wb)
}
