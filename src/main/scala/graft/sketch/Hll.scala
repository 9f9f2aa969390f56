package graft.sketch

/** HyperLogLog with the reference's register/estimator semantics
  * (`/root/reference/src/HyperLogLog.cpp`, itself following Dashing / Ertl):
  *
  *  - registers: `m = 2^np` bytes; `add`: index = top np bits of the hash,
  *    value = clz(((h<<1)|1) << (np−1)) + 1, register = max
  *    (`HyperLogLog.cpp:479-486`).
  *  - merge = bytewise max (`HyperLogLog.cpp:446-456`) — monoid → Spark
  *    partial+final aggregate.
  *  - estimators: ORIGINAL (Flajolet + small/large-range corrections,
  *    `HyperLogLog.cpp:666-694`), ERTL_IMPROVED (σ/τ series,
  *    `HyperLogLog.h:61-90`), ERTL_MLE (Ertl Algorithm 8 secant solver,
  *    `HyperLogLog.cpp:525-593`; the reference default, `Sketch.h:399`).
  *  - joint: ERTL_JOINT_MLE over the 6 joint register statistics
  *    (`HyperLogLog.cpp:362-400,594-645`) → (|A∖B|, |B∖A|, |A∩B|) and
  *    jaccard = ∩/∪ (`HyperLogLog.cpp:513-522`).
  */
object Hll {

  final val EstOriginal = 0
  final val EstErtlImproved = 1
  final val EstErtlMle = 2

  @inline def m(np: Int): Int = 1 << np

  def alpha(m: Long): Double = m match {
    case 16 => 0.673
    case 32 => 0.697
    case 64 => 0.709
    case _  => 0.7213 / (1 + 1.079 / m.toDouble)
  }

  def init(np: Int): Array[Byte] = new Array[Byte](1 << np)

  /** add a pre-hashed 64-bit value. */
  def add(regs: Array[Byte], hashval: Long, np: Int): Unit = {
    val q = 64 - np
    val index = (hashval >>> q).toInt
    val lzt = (java.lang.Long.numberOfLeadingZeros(((hashval << 1) | 1L) << (np - 1)) + 1).toByte
    if ((regs(index) & 0xff) < (lzt & 0xff)) regs(index) = lzt
  }

  /** in-place bytewise-max merge of `other` into `acc`. */
  def mergeInto(acc: Array[Byte], other: Array[Byte]): Array[Byte] = {
    require(acc.length == other.length, s"HLL np mismatch: ${acc.length} != ${other.length}")
    var i = 0
    while (i < acc.length) {
      if ((other(i) & 0xff) > (acc(i) & 0xff)) acc(i) = other(i)
      i += 1
    }
    acc
  }

  /** register-value histogram: counts(v) = #registers equal to v (v ∈ [0,63]). */
  def sumCounts(regs: Array[Byte]): Array[Int] = {
    val c = new Array[Int](64)
    var i = 0
    while (i < regs.length) { c(regs(i) & 0xff) += 1; i += 1 }
    c
  }

  def estimate(regs: Array[Byte], np: Int, method: Int = EstErtlMle): Double = {
    val counts = sumCounts(regs)
    calculateEstimate(counts, method, 1L << np, np, 1e-2)
  }

  def calculateEstimate(counts: Array[Int], estim: Int, m: Long, p: Int, relerr: Double): Double = estim match {
    case EstOriginal =>
      var sum = counts(0).toDouble
      var i = 1
      while (i < 64) { if (counts(i) != 0) sum += Math.scalb(counts(i).toDouble, -i); i += 1 }
      var value = alpha(m) * m * m / sum
      if (value < 2.5 * m) {
        if (counts(0) != 0) value = m * math.log(m.toDouble / counts(0))
      } else if (value > (1L << 32) / 30.0) {
        val corr = -math.pow(2.0, 32) * math.log1p(-Math.scalb(value, -32))
        if (!corr.isNaN) value = corr
      }
      value
    case EstErtlImproved =>
      val divinv = 1.0 / (2.0 * math.log(2.0))
      var z = m * tau((m - counts(64 - p + 1)).toDouble / m.toDouble)
      var i = 64 - p
      while (i >= 1) { z += counts(i); z *= 0.5; i -= 1 }
      z += m * sigma(counts(0).toDouble / m.toDouble)
      m * divinv * m / z
    case EstErtlMle =>
      ertlMlEstimate(counts, p, 64 - p, relerr)
  }

  def sigma(x0: Double): Double = {
    if (x0 == 1.0) return Double.PositiveInfinity
    var x = x0
    var z = x
    var zp = 0.0
    var y = 1.0
    while (z != zp) {
      x *= x; zp = z; z += x * y; y += y
      if (z.isNaN) return zp
    }
    z
  }

  def tau(x0: Double): Double = {
    if (x0 == 0.0 || x0 == 1.0) return 0.0
    var x = x0
    var z = 1 - x
    var zp = x
    var y = 1.0
    while (zp != z) {
      x = math.sqrt(x)
      zp = z
      y *= 0.5
      val tmp = 1.0 - x
      z -= tmp * tmp * y
    }
    z / 3.0
  }

  /** Ertl ML estimator (Algorithm 8); `c` is a register histogram with
    * indices 0..q+1 meaningful. */
  def ertlMlEstimate(c: Array[Int], p: Int, q: Int, relerr0: Double): Double = {
    val m = 1L << p
    if (c(q + 1) == m) return Double.PositiveInfinity
    var kMin = 0
    while (c(kMin) == 0) kMin += 1
    val kMinPrime = math.max(1, kMin)
    var kMax = q + 1
    while (kMax > 0 && c(kMax) == 0) kMax -= 1
    val kMaxPrime = math.min(q, kMax)
    var z = 0.0
    var k = kMaxPrime
    while (k >= kMinPrime) { z = 0.5 * z + c(k); k -= 1 }
    z = Math.scalb(z, -kMinPrime)
    var cPrime = c(q + 1)
    if (q > 0) cPrime += c(kMaxPrime)
    val a = z + c(0)
    val mPrime = m - c(0)
    var gprev = z + Math.scalb(c(q + 1).toDouble, -q)
    var x = if (gprev <= 1.5 * a) mPrime / (0.5 * gprev + a) else (mPrime / gprev) * math.log1p(gprev / a)
    gprev = 0.0
    var deltaX = x
    val relerr = relerr0 / math.sqrt(m.toDouble)
    while (deltaX > x * relerr) {
      // frexp exponent: x = f * 2^e with f in [0.5, 1)
      val kappaMinus1 = Math.getExponent(x) + 1
      var xPrime = Math.scalb(x, -math.max(kMaxPrime + 1, kappaMinus1 + 2))
      val xPrime2 = xPrime * xPrime
      var h = xPrime - xPrime2 / 3 + (xPrime2 * xPrime2) * (1.0 / 45.0 - xPrime2 / 472.5)
      var kk = kappaMinus1
      while (kk >= kMaxPrime) {
        val hPrime = 1.0 - h
        h = (xPrime + h * hPrime) / (xPrime + hPrime)
        xPrime += xPrime
        kk -= 1
      }
      var g = cPrime * h
      kk = kMaxPrime - 1
      while (kk >= kMinPrime) {
        val hPrime = 1.0 - h
        h = (xPrime + h * hPrime) / (xPrime + hPrime)
        xPrime += xPrime
        g += c(kk) * h
        kk -= 1
      }
      g += x * a
      if (gprev < g && g <= mPrime) deltaX *= (g - mPrime) / (gprev - g)
      else deltaX = 0.0
      x += deltaX
      gprev = g
    }
    x * m
  }

  /** joint register statistics of two sketches (`compTwoSketch`). Returns
    * (c1, c2, cu, cg1, cg2, ceq), each a 64-bucket histogram. */
  def compTwoSketch(s1: Array[Byte], s2: Array[Byte])
      : (Array[Int], Array[Int], Array[Int], Array[Int], Array[Int], Array[Int]) = {
    require(s1.length == s2.length)
    val c1l = new Array[Int](64); val c2l = new Array[Int](64)
    val c1g = new Array[Int](64); val c2g = new Array[Int](64)
    val ceq = new Array[Int](64)
    var i = 0
    while (i < s1.length) {
      val a = s1(i) & 0xff
      val b = s2(i) & 0xff
      if (a < b) { c1l(a) += 1; c2g(b) += 1 }
      else if (a > b) { c1g(a) += 1; c2l(b) += 1 }
      else ceq(a) += 1
      i += 1
    }
    val c1 = new Array[Int](64); val c2 = new Array[Int](64); val cu = new Array[Int](64)
    i = 0
    while (i < 64) {
      c1(i) = c1l(i) + ceq(i) + c1g(i)
      c2(i) = c2l(i) + ceq(i) + c2g(i)
      cu(i) = c1g(i) + ceq(i) + c2g(i)
      i += 1
    }
    (c1, c2, cu, c1g, c2g, ceq)
  }

  /** ERTL joint MLE: (|A∖B|, |B∖A|, |A∩B|) (`ertl_joint`). */
  def jointMle(h1: Array[Byte], h2: Array[Byte], np: Int): (Double, Double, Double) = {
    val p = np
    val q = 64 - np
    val (c1, c2, cu, cg1, cg2, ceq) = compTwoSketch(h1, h2)
    val cAX = ertlMlEstimate(c1, p, q, 1e-2)
    val cBX = ertlMlEstimate(c2, p, q, 1e-2)
    val cABX = ertlMlEstimate(cu, p, q, 1e-2)
    val countsAXBhalf = new Array[Int](64)
    val countsBXAhalf = new Array[Int](64)
    val mm = (1L << p).toInt
    countsAXBhalf(q) = mm
    countsBXAhalf(q) = mm
    var _q = 0
    while (_q < q) {
      countsAXBhalf(_q) = cg1(_q) + ceq(_q) + cg2(_q + 1)
      countsAXBhalf(q) -= countsAXBhalf(_q)
      countsBXAhalf(_q) = cg2(_q) + ceq(_q) + cg1(_q + 1)
      countsBXAhalf(q) -= countsBXAhalf(_q)
      _q += 1
    }
    val cAXBhalf = ertlMlEstimate(countsAXBhalf, p, q - 1, 1e-2)
    val cBXAhalf = ertlMlEstimate(countsBXAhalf, p, q - 1, 1e-2)
    val r0 = cABX - cBX
    val r1 = cABX - cAX
    val cX1 = 1.5 * cBX + 1.5 * cAX - cBXAhalf - cAXBhalf
    val cX2 = 2.0 * (cBXAhalf + cAXBhalf) - 3.0 * cABX
    val r2 = math.max(0.0, 0.5 * (cX1 + cX2))
    (r0, r1, r2)
  }

  def jaccardMle(h1: Array[Byte], h2: Array[Byte], np: Int): Double = {
    val (a, b, inter) = jointMle(h1, h2, np)
    val denom = a + b + inter
    if (denom == 0.0) 0.0 else inter / denom
  }

  /** inclusion–exclusion jaccard via union-register estimate (non-MLE path,
    * `HyperLogLog.cpp:496-522`). */
  def jaccardIncExc(h1: Array[Byte], h2: Array[Byte], np: Int, method: Int = EstErtlMle): Double = {
    val union = h1.clone()
    mergeInto(union, h2)
    val us = estimate(union, np, method)
    if (us == 0.0) return 0.0
    val ret = (estimate(h1, np, method) + estimate(h2, np, method) - us) / us
    math.max(0.0, ret)
  }
}
