package graft.tools

import graft.data.SyntheticImages
import graft.multimodal.Decode

/** dev tool: per-format and per-step breakdown of the image decode cost —
  * PNG vs JPEG, stream setup vs reader.read vs getRGB — to target the
  * decode-path optimization (r6). Single JVM, no Spark. */
object DecodeSplit {
  def main(args: Array[String]): Unit = {
    val rows = (0L until 4000L).flatMap(f => SyntheticImages.family(f, 42L, f * 8))
    val png = rows.filter(_.fmt == "png").map(_.bytes).toArray
    val jpg = rows.filter(_.fmt == "jpeg").map(_.bytes).toArray
    println(s"DSPLIT n_png=${png.length} n_jpg=${jpg.length} " +
      s"png_avg_bytes=${png.map(_.length).sum / png.length} " +
      s"jpg_avg_bytes=${jpg.map(_.length).sum / jpg.length}")
    var sink = 0L
    def time(name: String, n: Int)(f: => Unit): Unit =
      (1 to 3).foreach { _ =>
        val t0 = System.nanoTime()
        f
        val dt = System.nanoTime() - t0
        println(f"DSPLIT $name%-24s ${dt / 1e6}%8.1f ms  ${dt.toDouble / n}%8.0f ns/img")
      }
    val dec = new Decode.ReusableDecoder
    time("png_decode_full", png.length) {
      var i = 0
      while (i < png.length) { sink ^= dec.decodePixels(png(i))(0); i += 1 }
    }
    time("jpg_decode_full", jpg.length) {
      var i = 0
      while (i < jpg.length) { sink ^= dec.decodePixels(jpg(i))(0); i += 1 }
    }
    time("png_decode_noRGB", png.length) {
      var i = 0
      while (i < png.length) { sink ^= dec.decodeImage(png(i)).getWidth; i += 1 }
    }
    time("jpg_decode_noRGB", jpg.length) {
      var i = 0
      while (i < jpg.length) { sink ^= dec.decodeImage(jpg(i)).getWidth; i += 1 }
    }
    // stream setup only: create + close the image input stream per image
    time("stream_setup_only", png.length) {
      var i = 0
      while (i < png.length) {
        val iis = javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(png(i)))
        sink ^= iis.length()
        iis.close()
        i += 1
      }
    }
    // inflate only: raw zlib decompression of PNG IDAT payloads
    val inflater = new java.util.zip.Inflater()
    val out = new Array[Byte](32 * (1 + 32 * 3) + 64)
    time("png_inflate_only", png.length) {
      var i = 0
      while (i < png.length) {
        val b = png(i)
        // find first IDAT chunk (assume contiguous IDATs, typical for ImageIO)
        var off = 8
        var total = 0
        while (off + 8 <= b.length) {
          val len = ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
            ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)
          val isIdat = b(off + 4) == 'I' && b(off + 5) == 'D' && b(off + 6) == 'A' && b(off + 7) == 'T'
          if (isIdat) {
            inflater.setInput(b, off + 8, len)
            var done = false
            while (!done && !inflater.finished()) {
              val k = inflater.inflate(out, total, out.length - total)
              total += k
              if (k == 0) done = true
            }
          }
          off += 8 + len + 4
        }
        inflater.reset()
        sink ^= total
        i += 1
      }
    }
    println(s"sink=$sink")
  }
}
