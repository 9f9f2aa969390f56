package graft.data

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import javax.imageio.{IIOImage, ImageIO, ImageWriteParam}

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.hash.HashKernels
import graft.hash.HashKernels.SplitMix64

/** Deterministic synthetic image+caption corpus with the authoritative input
  * schema (`BASELINE.json.input_hint`):
  * `(image_id string, bytes binary, w int, h int, fmt string, caption string,
  * phash bigint)` plus a `truth_cluster` ground-truth side column (used only
  * by recall metrics/tests, never by the pipeline).
  *
  * Rows are emitted in duplicate *families* (FIXTURES.md §F1): a base image
  * (gradient + seeded noise, real PNG/JPEG bytes via javax.imageio, pHash =
  * real 8×8-DCT perceptual hash of the pixels) plus 0..4 mutated copies
  * (pixel noise re-encoded, caption token churn ≤ 10%, pHash within Hamming
  * ≤ 3 of the base). Everything derives from `splitmix64(seed ^ familyId)` —
  * no external data, same bytes on every run, generated **distributed**
  * (`spark.range(families).flatMap`), so corpus creation itself scales with
  * the cluster.
  */
object SyntheticImages {

  // in-memory image streams: the default file-backed ImageIO cache writes a
  // temp file per encode/decode call — measured ~3.4 core-ms per 32×32 image
  ImageIO.setUseCache(false)

  val Size = 32

  /** fixed 1000-word deterministic vocabulary. */
  val vocab: Array[String] = {
    val syll = Array("ba", "ko", "ri", "ta", "mu", "ze", "lo", "pi", "sa", "ne",
      "du", "fa", "gi", "ho", "ju", "ka", "le", "mo", "nu", "pe")
    val out = new Array[String](1000)
    var i = 0
    while (i < 1000) {
      out(i) = syll(i % 20) + syll((i / 20) % 20) + syll((i / 400) % 20)
      i += 1
    }
    out
  }

  case class Row(
      image_id: String, bytes: Array[Byte], w: Int, h: Int, fmt: String,
      caption: String, phash: Long, truth_cluster: Long)

  // ---- pixel synthesis ----

  private def basePixels(g: SplitMix64): Array[Int] = {
    val px = new Array[Int](Size * Size)
    val cx = g.nextDouble() * Size
    val cy = g.nextDouble() * Size
    val fr = 0.05 + g.nextDouble() * 0.3
    val phase = g.nextDouble() * math.Pi * 2
    var y = 0
    while (y < Size) {
      var x = 0
      while (x < Size) {
        val d = math.hypot(x - cx, y - cy)
        val v = 128 + 100 * math.sin(d * fr * math.Pi + phase)
        val noise = ((g.nextLong() >>> 58).toInt - 32) / 4 // ±8
        // low-chroma palette: ImageIO's JPEG writer subsamples chroma 4:2:0,
        // so strong per-pixel chroma would cap PSNR near 30 dB; the
        // input_hint invariant demands >= 40 dB for lossy rows
        val r = clamp255(v.toInt + noise)
        val gg = clamp255((v * 0.85).toInt + noise)
        val b = clamp255((v * 0.7).toInt + 30 + noise)
        px(y * Size + x) = (r << 16) | (gg << 8) | b
        x += 1
      }
      y += 1
    }
    px
  }

  private def mutatePixels(src: Array[Int], g: SplitMix64): Array[Int] = {
    val out = src.clone()
    // small deterministic perturbation: ±2 brightness on ~10% of pixels
    var i = 0
    while (i < out.length) {
      if ((g.nextLong() & 7L) == 0L) {
        val p = out(i)
        val d = ((g.nextLong() & 3L) - 1L).toInt * 2
        val r = clamp255(((p >> 16) & 0xff) + d)
        val gg = clamp255(((p >> 8) & 0xff) + d)
        val b = clamp255((p & 0xff) + d)
        out(i) = (r << 16) | (gg << 8) | b
      }
      i += 1
    }
    out
  }

  @inline private def clamp255(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v

  // ---- DCT pHash (standard 64-bit perceptual hash) ----

  private lazy val dctCos: Array[Array[Double]] = {
    Array.tabulate(8, Size)((u, x) => math.cos((2 * x + 1) * u * math.Pi / (2.0 * Size)))
  }

  def dctPhash(pixels: Array[Int]): Long = {
    // contract: exactly one Size×Size frame — callers resample first
    // (Decode.imageMeta); anything else must fail loudly, not hash a
    // truncated or overrun buffer
    require(pixels.length == Size * Size,
      s"dctPhash expects ${Size}x$Size pixels, got ${pixels.length}")
    val gray = new Array[Double](Size * Size)
    var i = 0
    while (i < pixels.length) {
      val p = pixels(i)
      gray(i) = 0.299 * ((p >> 16) & 0xff) + 0.587 * ((p >> 8) & 0xff) + 0.114 * (p & 0xff)
      i += 1
    }
    dctPhashGray(gray)
  }

  /** [[dctPhash]] over a precomputed grayscale plane (the same per-pixel
    * luma formula) — lets Decode.imageMeta share one gray pass between the
    * mean-luma and the pHash (r6 optimization; bit-identical by construction). */
  def dctPhashGray(gray: Array[Double]): Long = {
    require(gray.length == Size * Size,
      s"dctPhashGray expects ${Size}x$Size pixels, got ${gray.length}")
    var i = 0
    // separable 2D DCT: row pass then column pass — 8·S² + 64·S mults per
    // image instead of the naive 64·S² (measured 2× on the full decode-meta
    // stage at the 4.25M-row corpus)
    val tmp = Array.ofDim[Double](8, Size)
    var u = 0
    while (u < 8) {
      val cu = dctCos(u)
      val tu = tmp(u)
      var y = 0
      while (y < Size) {
        val off = y * Size
        var s = 0.0
        var x = 0
        while (x < Size) { s += gray(off + x) * cu(x); x += 1 }
        tu(y) = s
        y += 1
      }
      u += 1
    }
    val coef = new Array[Double](64)
    u = 0
    while (u < 8) {
      val tu = tmp(u)
      var v = 0
      while (v < 8) {
        val cv = dctCos(v)
        var s = 0.0
        var y = 0
        while (y < Size) { s += tu(y) * cv(y); y += 1 }
        coef(u * 8 + v) = s
        v += 1
      }
      u += 1
    }
    // median of AC coefficients (skip DC at index 0); primitive sort — the
    // generic .sorted boxes every double
    val ac = java.util.Arrays.copyOfRange(coef, 1, 64)
    java.util.Arrays.sort(ac)
    val median = (ac(31) + ac(32)) / 2.0
    var bits = 0L
    i = 1
    while (i < 64) {
      if (coef(i) > median) bits |= (1L << (i - 1))
      i += 1
    }
    bits
  }

  // ---- encoding ----

  def encode(pixels: Array[Int], fmt: String): Array[Byte] = {
    val img = new BufferedImage(Size, Size, BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, Size, Size, pixels, 0, Size)
    val bos = new ByteArrayOutputStream()
    if (fmt == "jpeg") {
      val writer = ImageIO.getImageWritersByFormatName("jpeg").next()
      val ios = ImageIO.createImageOutputStream(bos)
      writer.setOutput(ios)
      val p = writer.getDefaultWriteParam
      p.setCompressionMode(ImageWriteParam.MODE_EXPLICIT)
      p.setCompressionQuality(0.98f)
      // force 4:4:4 — the writer's default 4:2:0 chroma subsampling caps
      // PSNR near 36 dB on this palette; input_hint demands ≥ 40 dB vs the
      // original pixels for lossy rows
      val typeSpec = javax.imageio.ImageTypeSpecifier.createFromRenderedImage(img)
      val meta = writer.getDefaultImageMetadata(typeSpec, p)
      val fmtName = "javax_imageio_jpeg_image_1.0"
      val tree = meta.getAsTree(fmtName)
      def walk(n: org.w3c.dom.Node): Unit = {
        if (n.getNodeName == "componentSpec") {
          val e = n.asInstanceOf[javax.imageio.metadata.IIOMetadataNode]
          e.setAttribute("HsamplingFactor", "1")
          e.setAttribute("VsamplingFactor", "1")
        }
        var c = n.getFirstChild
        while (c != null) { walk(c); c = c.getNextSibling }
      }
      walk(tree)
      meta.setFromTree(fmtName, tree)
      writer.write(null, new IIOImage(img, null, meta), p)
      writer.dispose()
      ios.close()
    } else {
      ImageIO.write(img, "png", bos)
    }
    bos.toByteArray
  }

  def decodePixels(bytes: Array[Byte]): Array[Int] = {
    val img = ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    img.getRGB(0, 0, img.getWidth, img.getHeight, null, 0, img.getWidth)
  }

  def psnr(a: Array[Int], b: Array[Int]): Double = {
    var mse = 0.0
    var i = 0
    while (i < a.length) {
      var ch = 0
      while (ch < 3) {
        val d = (((a(i) >> (ch * 8)) & 0xff) - ((b(i) >> (ch * 8)) & 0xff)).toDouble
        mse += d * d
        ch += 1
      }
      i += 1
    }
    mse /= (a.length * 3)
    if (mse == 0) Double.PositiveInfinity else 10 * math.log10(255.0 * 255.0 / mse)
  }

  // ---- caption synthesis ----

  private def baseCaption(g: SplitMix64): Array[String] = {
    val n = 10 + ((g.nextLong() >>> 1) % 21).toInt // 10..30 tokens
    Array.fill(n)(vocab(((g.nextLong() >>> 1) % vocab.length).toInt))
  }

  private def churnCaption(tokens: Array[String], g: SplitMix64): String = {
    val out = tokens.clone()
    val churn = math.max(1, tokens.length / 10) // ≤10% token churn
    var i = 0
    while (i < churn) {
      val pos = ((g.nextLong() >>> 1) % out.length).toInt
      out(pos) = vocab(((g.nextLong() >>> 1) % vocab.length).toInt)
      i += 1
    }
    out.mkString(" ")
  }

  private def flipBits(phash: Long, n: Int, g: SplitMix64): Long = {
    var h = phash
    var i = 0
    while (i < n) {
      h ^= 1L << ((g.nextLong() >>> 58).toInt) // 0..63
      i += 1
    }
    h
  }

  // ---- family emission ----

  /** one family's ground truth BEFORE byte encoding: the exact RNG replay of
    * [[family]], minus the (RNG-free) `encode` step. Exposed so payload-
    * fidelity checks can regenerate the original pixels/captions per row and
    * compare against what decodes from the stored bytes. */
  case class Truth(
      image_id: String, pixels: Array[Int], fmt: String, caption: String, phash: Long)

  def familyTruth(famId: Long, seed: Long, globalIndexBase: Long): Seq[Truth] = {
    val g = new SplitMix64(HashKernels.fmix64Seeded(famId, seed))
    val pixels = basePixels(g)
    val phash = dctPhash(pixels)
    val capTokens = baseCaption(g)
    val u = g.nextDouble()
    val nDups = if (u < 0.55) 0 else 1 + ((g.nextLong() >>> 1) % 4).toInt
    val rows = Vector.newBuilder[Truth]
    var d = 0
    while (d <= nDups) {
      val fmt = if (((g.nextLong() >>> 1) & 1L) == 0L) "png" else "jpeg"
      val px = if (d == 0) pixels else mutatePixels(pixels, g)
      val ph = if (d == 0) phash else flipBits(phash, ((g.nextLong() >>> 1) % 4).toInt, g) // 0..3 flips
      val cap = if (d == 0) capTokens.mkString(" ") else churnCaption(capTokens, g)
      rows += Truth(f"img_${globalIndexBase + d}%010d", px, fmt, cap, ph)
      d += 1
    }
    rows.result()
  }

  def family(famId: Long, seed: Long, globalIndexBase: Long): Seq[Row] =
    familyTruth(famId, seed, globalIndexBase).map { t =>
      Row(t.image_id, encode(t.pixels, t.fmt), Size, Size, t.fmt, t.caption, t.phash, famId)
    }

  /** rows per scale factor directory name (deterministic mapping). */
  def familiesFor(sfDir: String): Int = {
    val name = new java.io.File(sfDir).getName
    name match {
      case "sf0.001" => 1200
      case "sf0.01"  => 12000
      case "sf0.1"   => 2000000 // sized so the local[8] e2e run takes >= 60 s
                                // (BASELINE.md protocol; re-sized after the
                                // run-walk/marker pipeline got ~1.5× faster)
      case "sf0.3"   => 6000000  // full-bytes mid-scale: decode-stage proof
      case "sf1"     => 20000000 // 10× scale proof (lite corpus, see ensureLite)
      case _         => 12000
    }
  }

  def corpusPath(sfDir: String): String =
    s"/root/repo/gendata/images_${new java.io.File(sfDir).getName}.parquet"

  def litePath(sfDir: String): String =
    s"/root/repo/gendata/images_${new java.io.File(sfDir).getName}_lite.parquet"

  /** the corpus minus the `bytes` payload column, for scale factors whose
    * encoded bytes exceed the sandbox disk (sf1 ≈ 87 GB encoded vs 71 GB
    * free). Replays the IDENTICAL RNG stream as [[family]] — `encode` is the
    * only skipped step and it draws nothing — so image_id/fmt/caption/phash
    * match the full corpus bit-for-bit (asserted in SyntheticImagesSpec).
    * Faithful for the dedup pipeline scale proof: the sketch→cluster job
    * never reads `bytes` (columnar scan prunes it, asserted in
    * PipelineSpec), so the measured work is identical either way. */
  case class RowLite(
      image_id: String, w: Int, h: Int, fmt: String,
      caption: String, phash: Long, truth_cluster: Long)

  def familyLite(famId: Long, seed: Long, globalIndexBase: Long): Seq[RowLite] =
    familyTruth(famId, seed, globalIndexBase).map { t =>
      RowLite(t.image_id, Size, Size, t.fmt, t.caption, t.phash, famId)
    }

  /** Generate (if absent) and return the bytes-free corpus. More write
    * partitions than [[ensure]] (generation is CPU-bound pixel/DCT work;
    * 256 tasks keep 32 cores busy without skewing the last wave). */
  def ensureLite(spark: SparkSession, sfDir: String, seed: Long = 42L): DataFrame = {
    val path = litePath(sfDir)
    val done = new java.io.File(path, "_SUCCESS")
    if (!done.exists()) {
      import spark.implicits._
      val nFam = familiesFor(sfDir)
      spark.range(0, nFam.toLong, 1, math.min(256, math.max(1, nFam / 256)))
        .flatMap(fid => familyLite(fid, seed, fid * 8))
        .write.mode("overwrite").parquet(path)
    }
    spark.read.parquet(path)
  }

  /** Generate (if absent) and return the corpus as a DataFrame. Max family
    * size is 5 ⇒ id-space stride 8 keeps global ids unique and sorted. */
  def ensure(spark: SparkSession, sfDir: String, seed: Long = 42L): DataFrame = {
    val path = corpusPath(sfDir)
    val done = new java.io.File(path, "_SUCCESS")
    if (!done.exists()) {
      import spark.implicits._
      val nFam = familiesFor(sfDir)
      spark.range(0, nFam.toLong, 1, math.min(32, math.max(1, nFam / 256)))
        .flatMap(fid => family(fid, seed, fid * 8))
        .write.mode("overwrite").parquet(path)
    }
    spark.read.parquet(path)
  }
}
