package graft.sources

import graft.SparkSpec
import graft.functions.ImageOps
import org.apache.spark.sql.functions._

/** Real image codec (B4/B5/B6): decode/encode round trips, Pillow-
  * semantics pixel math, determinism of the seeded scan pipeline, and
  * the Catalyst expression wrappers (interpreted AND codegen paths).
  */
class ImageCodecSpec extends SparkSpec {
  import ImageCodec._
  import spark.implicits._

  private def constPng(r: Int, g: Int, b: Int, w: Int = 40, h: Int = 30): Array[Byte] =
    encodePng(Px(w, h, Array.fill(w * h)((r << 16) | (g << 8) | b)))

  test("synthPng is deterministic, decodable, and dimensioned as asked") {
    val a = synthPng(7, 33, 21)
    val b = synthPng(7, 33, 21)
    assert(a.toSeq === b.toSeq)
    assert(isPng(a))
    val px = decode(a)
    assert(px.w === 33 && px.h === 21)
    assert(decode(synthPng(8, 33, 21)).rgb.toSeq !== px.rgb.toSeq) // seed-sensitive
  }

  test("decode handles JPEG/PNG magic, rejects non-images, strips alpha to white") {
    assert(decode("not an image".getBytes) === null)
    assert(decode(null) === null)
    assert(decode(Array[Byte]()) === null)
    val jpg = encodeJpeg(Px(8, 8, Array.fill(64)(0x808080)), 90)
    assert(isJpeg(jpg) && formatName(jpg) === "JPEG")
    assert(decode(jpg).w === 8)
  }

  test("brightness matches Pillow blend-with-black semantics") {
    val px = Px(2, 1, Array(0x644020, 0xff0000))
    val out = brightness(px, 1.5)
    // 0x64=100 -> 150, 0x40=64 -> 96, 0x20=32 -> 48; 255 clamps
    assert(out.rgb(0) === (150 << 16 | 96 << 8 | 48))
    assert(out.rgb(1) === 0xff0000)
  }

  test("contrast is identity on a constant image and extrapolates around the mean") {
    val const = Px(4, 4, Array.fill(16)(0x506070))
    // constant image: every channel-vs-mean blend keeps distances scaled
    // around the SAME mean, so applying f=1 must be exact identity
    assert(contrast(const, 1.0).rgb.toSeq === const.rgb.toSeq)
    // two-tone image, f>1 pushes values away from the mean
    val two = Px(2, 1, Array(0x202020, 0xe0e0e0)) // lumas 32, 224, mean 128
    val out = contrast(two, 1.25)
    assert((out.rgb(0) & 0xff) < 0x20 && (out.rgb(1) & 0xff) > 0xe0)
  }

  test("saturation 0 is grayscale; 1 is identity") {
    val px = Px(1, 1, Array(0xff0000)) // pure red, luma 76
    val gray = saturation(px, 0.0).rgb(0)
    assert(gray === (76 << 16 | 76 << 8 | 76))
    assert(saturation(px, 1.0).rgb(0) === 0xff0000)
  }

  test("3x3 filters are identity on constant interiors and preserve borders") {
    val const = Px(6, 6, Array.fill(36)(0x804020))
    for (f <- Seq(sharpenFilter _, edgeEnhance _, edgeEnhanceMore _, detailFilter _)) {
      assert(f(const).rgb.toSeq === const.rgb.toSeq)
    }
    // border pixels are copied unfiltered (Pillow contract)
    val noisy = Px(5, 5, Array.tabulate(25)(i => (i * 37) % 256 << 16))
    assert(sharpenFilter(noisy).rgb(0) === noisy.rgb(0))
    assert(sharpenFilter(noisy).rgb(24) === noisy.rgb(24))
  }

  test("gaussianBlur reduces variance, preserves constant images, radius<=0 is identity") {
    val const = Px(8, 8, Array.fill(64)(0x777777))
    assert(gaussianBlur(const, 0.5).rgb.toSeq === const.rgb.toSeq)
    val px = decode(synthPng(3, 32, 32))
    assert(gaussianBlur(px, 0.0) eq px)
    def variance(p: Px): Double = {
      val lumas = p.rgb.map(c => ((c >> 16 & 0xff) * 299 + (c >> 8 & 0xff) * 587 + (c & 0xff) * 114 + 500) / 1000.0)
      val m = lumas.sum / lumas.length
      lumas.map(l => (l - m) * (l - m)).sum / lumas.length
    }
    assert(variance(gaussianBlur(px, 1.5)) < variance(px))
  }

  test("rotate keeps dims, small angles move mass, zero angle is identity") {
    val px = decode(synthPng(5, 24, 16))
    assert(rotate(px, 0.0) eq px)
    val r = rotate(px, 1.0)
    assert(r.w === 24 && r.h === 16)
    assert(r.rgb.toSeq !== px.rgb.toSeq)
  }

  test("scanEffectsMinimal: JPEG output, dims preserved, deterministic, preset-sensitive") {
    val in = synthPng(11, 48, 36)
    val out = scanEffectsMinimal(in, "balanced")
    assert(isJpeg(out))
    val px = decode(out)
    assert(px.w === 48 && px.h === 36)
    assert(out.toSeq === scanEffectsMinimal(in, "balanced").toSeq) // deterministic
    assert(out.toSeq !== scanEffectsMinimal(in, "minimum").toSeq) // preset matters
    assert(scanEffectsMinimal("%PDF-1.4 not an image".getBytes, "balanced") === null)
  }

  test("scanEffectsMinimal brightens a mid-gray image as the preset prescribes") {
    // constant mid-gray: contrast/blur/saturation are ~identity, so the
    // pipeline reduces to brightness 1.05 (minimum preset) + JPEG noise
    val in = constPng(127, 127, 127)
    val outLuma = meanLuma(scanEffectsMinimal(in, "minimum"))
    assert(math.abs(outLuma - 127 * 1.05) < 4.0, s"expected ~${127 * 1.05}, got $outLuma")
  }

  test("scanEffects seeded: deterministic per seed, seed-sensitive, dims preserved") {
    val in = synthPng(13, 50, 40)
    val a = scanEffects(in, "realistic", 42L)
    val b = scanEffects(in, "realistic", 42L)
    val c = scanEffects(in, "realistic", 43L)
    assert(a.toSeq === b.toSeq)
    assert(a.toSeq !== c.toSeq)
    assert(isJpeg(a))
    val px = decode(a)
    assert(px.w === 50 && px.h === 40) // expand=False keeps dims
    assert(scanEffects("plaintext".getBytes, "realistic", 1L) === null)
  }

  test("scanEffects noise raises variance on a constant image") {
    val in = constPng(100, 100, 100, 60, 50)
    val out = decode(scanEffects(in, "heavy", 7L))
    val lumas = out.rgb.map(c => ((c >> 16 & 0xff) * 299 + (c >> 8 & 0xff) * 587 + (c & 0xff) * 114 + 500) / 1000.0)
    val m = lumas.sum / lumas.length
    val v = lumas.map(l => (l - m) * (l - m)).sum / lumas.length
    assert(v > 1.0, s"expected noise-driven variance, got $v")
  }

  test("resize: exact dims, identity at same size, constant images stay constant") {
    val px = decode(synthPng(21, 30, 20))
    assert(resize(px, 30, 20) eq px)
    val up = resize(px, 60, 40)
    assert(up.w === 60 && up.h === 40)
    val down = resize(px, 15, 10)
    assert(down.w === 15 && down.h === 10)
    val const = Px(8, 8, Array.fill(64)(0x336699))
    assert(resize(const, 20, 12).rgb.forall(_ === 0x336699))
  }

  test("compressImage: B1 preset dpi geometry, deterministic, JPEG out, null for PDFs") {
    val in = synthPng(23, 30, 24)
    val out = compressImage(in, "balanced") // 150 dpi: dims scale by 150/72
    assert(isJpeg(out))
    val px = decode(out)
    assert(px.w === 30 * 150 / 72 && px.h === 24 * 150 / 72) // 62 x 50
    assert(out.toSeq === compressImage(in, "balanced").toSeq)
    // minimum preset: 90 dpi, lower jpeg quality -> different geometry
    val lo = decode(compressImage(in, "minimum"))
    assert(lo.w === 30 * 90 / 72 && lo.h === 24 * 90 / 72)
    assert(compressImage("%PDF-1.4".getBytes, "balanced") === null)
  }

  test("jpegReencode re-encodes at the asked quality; bigger q, bigger file") {
    val in = synthPng(17, 64, 48)
    val lo = jpegReencode(in, 30)
    val hi = jpegReencode(in, 95)
    assert(isJpeg(lo) && isJpeg(hi))
    assert(decode(lo).w === 64 && decode(hi).h === 48)
    assert(hi.length > lo.length)
    assert(jpegReencode("nope".getBytes, 85) === null)
  }

  test("stampTextBox draws text ONLY inside the box, deterministically; empty lines no-op") {
    val px = Px(100, 80, Array.fill(100 * 80)(0xffffff))
    val stamped = stampTextBox(px, Seq("Firmado por: Test", "Fecha: 2026-01-01"), 10, 20, 90, 60)
    // something was drawn...
    assert(stamped.rgb.exists(_ != 0xffffff))
    // ...but nothing outside the box
    for (y <- 0 until 80; x <- 0 until 100
         if x < 10 || x >= 90 || y < 20 || y >= 60)
      assert(stamped.rgb(y * 100 + x) === 0xffffff, s"pixel ($x,$y) escaped the box")
    // deterministic within this JVM/font stack
    val again = stampTextBox(px, Seq("Firmado por: Test", "Fecha: 2026-01-01"), 10, 20, 90, 60)
    assert(again.rgb.toSeq === stamped.rgb.toSeq)
    assert(stampTextBox(px, Seq.empty, 10, 20, 90, 60) eq px)
    assert(stampTextBox(px, Seq("", ""), 10, 20, 90, 60) eq px)
  }

  // ---------------------------------------------------------------- Spark expressions

  test("ImageOps expressions: synth → scan → info round trip in a single projection") {
    val df = Seq(1L, 2L, 3L).toDF("doc_id")
      .withColumn("img", ImageOps.synthImage(col("doc_id"),
        (lit(40) + col("doc_id") % 17).cast("int"), (lit(30) + col("doc_id") % 13).cast("int")))
      .withColumn("scanned", ImageOps.scanMinimal(col("img"), "balanced"))
      .withColumn("info", ImageOps.imageInfo(col("scanned")))
      .select(col("doc_id"),
        col("info.width").as("w"), col("info.height").as("h"), col("info.format").as("fmt"))
    val rows = df.collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3)))
    assert(rows.toSeq === Seq(
      (1L, 41, 31, "JPEG"), (2L, 42, 32, "JPEG"), (3L, 43, 33, "JPEG")))
  }

  test("ImageOps.scanSeeded is a pure function of (content, seed) in Spark") {
    val df = Seq((1L, 5L), (2L, 5L), (3L, 6L)).toDF("doc_id", "seed")
      .withColumn("img", ImageOps.synthImage(lit(9L), lit(32), lit(24)))
      .withColumn("out", ImageOps.scanSeeded(col("img"), col("seed"), "medium"))
      .select(md5(col("out")).as("h"))
    val hs = df.collect().map(_.getString(0))
    assert(hs(0) === hs(1)) // same content+seed → same bytes
    assert(hs(0) !== hs(2)) // different seed → different bytes
  }

  test("image expressions null-propagate on undecodable payloads (PDF stays stub path)") {
    val df = Seq(("%PDF-1.4 fake".getBytes, 1L)).toDF("content", "doc_id")
      .select(
        ImageOps.scanMinimal(col("content"), "high").as("a"),
        ImageOps.scanSeeded(col("content"), col("doc_id"), "light").as("b"),
        ImageOps.jpegReencode(col("content"), 85).as("c"),
        ImageOps.imageInfo(col("content")).as("d"))
    val r = df.head
    assert(r.isNullAt(0) && r.isNullAt(1) && r.isNullAt(2) && r.isNullAt(3))
  }
}
