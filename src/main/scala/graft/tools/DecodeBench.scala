package graft.tools

import graft.data.SyntheticImages
import graft.multimodal.Decode

/** dev tool: single-JVM A/B of per-row ImageIO.read vs the per-partition
  * ReusableDecoder on generated corpus bytes. Not part of the driver
  * contract. */
object DecodeBench {
  def main(args: Array[String]): Unit = {
    val rows = (0L until 4000L).flatMap(f => SyntheticImages.family(f, 42L, f * 8))
    val bytes = rows.map(_.bytes).toArray
    println(s"DEC n=${bytes.length}")
    def time(name: String)(f: => Unit): Unit = {
      (1 to 3).foreach { _ =>
        val t0 = System.nanoTime()
        f
        println(f"DEC $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    time("imageio_read") {
      var i = 0
      while (i < bytes.length) {
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes(i)))
        img.getRGB(0, 0, img.getWidth, img.getHeight, null, 0, img.getWidth)
        i += 1
      }
    }
    time("reusable") {
      val dec = new Decode.ReusableDecoder
      var i = 0
      while (i < bytes.length) {
        dec.decodePixels(bytes(i))
        i += 1
      }
    }
  }
}
