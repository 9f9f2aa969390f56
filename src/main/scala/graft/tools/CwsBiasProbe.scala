package graft.tools

import graft.sketch.Cws

/** dev tool: isolate where the CWS estimator's deviation from exact weighted
  * jaccard comes from — slot disagreement vs weight asymmetry vs count-min
  * smoothing — on controlled near-identical spectra. Not part of the driver
  * contract.
  */
object CwsBiasProbe {
  def main(args: Array[String]): Unit = {
    val dim = 4096
    val s = 256
    val draws = Cws.genDraws(s, dim, 1L)
    val rnd = new java.util.Random(7)
    // base spectrum: 150 bins, freq 1..8 (token-tf-like)
    val bins = (0 until dim).filter(_ => rnd.nextDouble() < 150.0 / dim).toArray
    val base = bins.map(b => (b, 1.0 + rnd.nextInt(8).toDouble))
    for (nChanged <- Seq(0, 1, 2, 5, 10)) {
      val changed = base.zipWithIndex.map { case ((b, f), i) =>
        if (i < nChanged) (b, f + 1.0) else (b, f)
      }
      val exact = {
        var in = 0.0; var un = 0.0
        base.zip(changed).foreach { case ((_, fa), (_, fb)) =>
          in += math.min(fa, fb); un += math.max(fa, fb)
        }
        in / un
      }
      val (sa, wa) = Cws.cwsSketch(base.iterator, draws)
      val (sb, wb) = Cws.cwsSketch(changed.iterator, draws)
      val est = Cws.weightedJaccard(sa, wa, sb, wb)
      val agree = sa.zip(sb).count { case (x, y) => x == y }.toDouble / s
      println(f"CWSBIAS nChanged=$nChanged exact=$exact%.4f est=$est%.4f slotAgree=$agree%.4f")
    }
    // same but WITHOUT count-min (feed spectrum with exact freqs through a
    // cm-free path: emulate by calling cwsSketch on spectra whose cm
    // collisions are impossible — single-entry spectra scaled)
    // direction check on real-ish spectra with disjoint extra bins
    for (nExtra <- Seq(1, 5, 15)) {
      val extra = (0 until dim).filter(b => !bins.contains(b)).take(nExtra)
        .map(b => (b, 1.0 + rnd.nextInt(8).toDouble))
      val bWith = (base ++ extra).sortBy(_._1)
      val exact = {
        val am = base.toMap; val bm = bWith.toMap
        val keys = am.keySet ++ bm.keySet
        keys.toSeq.map(k => math.min(am.getOrElse(k, 0.0), bm.getOrElse(k, 0.0))).sum /
          keys.toSeq.map(k => math.max(am.getOrElse(k, 0.0), bm.getOrElse(k, 0.0))).sum
      }
      val (sa, wa) = Cws.cwsSketch(base.iterator, draws)
      val (sb, wb) = Cws.cwsSketch(bWith.iterator, draws)
      val est = Cws.weightedJaccard(sa, wa, sb, wb)
      val agree = sa.zip(sb).count { case (x, y) => x == y }.toDouble / s
      println(f"CWSBIAS nExtra=$nExtra exact=$exact%.4f est=$est%.4f slotAgree=$agree%.4f")
    }
  }
}
