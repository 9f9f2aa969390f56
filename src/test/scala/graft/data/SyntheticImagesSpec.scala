package graft.data

import org.scalatest.funsuite.AnyFunSuite

class SyntheticImagesSpec extends AnyFunSuite {

  test("lite corpus replays the identical RNG stream: non-bytes columns equal") {
    // the bytes-free sf1 scale corpus must be byte-identical to the full
    // generator on every column the dedup pipeline reads — encode() is the
    // only skipped step and it draws nothing from the RNG
    val full = (0L until 200L).flatMap(f => SyntheticImages.family(f, 42L, f * 8))
    val lite = (0L until 200L).flatMap(f => SyntheticImages.familyLite(f, 42L, f * 8))
    assert(full.size === lite.size)
    full.zip(lite).foreach { case (a, b) =>
      assert(a.image_id === b.image_id)
      assert(a.fmt === b.fmt)
      assert(a.caption === b.caption)
      assert(a.phash === b.phash)
      assert(a.truth_cluster === b.truth_cluster)
      assert(a.w === b.w && a.h === b.h)
    }
    assert(full.exists(_.bytes.nonEmpty))
  }
}
