package graft.sources

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.{IIOImage, ImageIO}
import javax.imageio.stream.{MemoryCacheImageInputStream, MemoryCacheImageOutputStream}

/** The VIDEO media family on a real container, zero new dependencies:
  * animated GIF is a genuine multi-frame moving-picture format and the
  * JDK's ImageIO reads AND writes its frame sequence natively. This
  * gives the engine real frame-sampling plumbing — frame count, frame
  * extraction, per-frame analysis — on real bytes; codec-bound
  * formats (H.264/VP9/AV1) still need native libraries the container
  * lacks and keep the documented stub in [[Multimodal]].
  *
  * Frames are returned as the RAW per-frame rasters the container
  * stores (what a frame-sampling pipeline wants), not the composited
  * playback state — disposal-method compositing is a player concern.
  * The synth fixture writes full-size frames of solid palette colors,
  * which GIF's 256-color model preserves exactly, so decoded pixels
  * are byte-deterministic and frame metadata is closed-form for the
  * oracle.
  */
object GifCodec {

  def isGif(b: Array[Byte]): Boolean =
    b != null && b.length > 6 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F'

  /** Number of frames in the container, or -1 when not a GIF /
    * unreadable. Counts via the reader's index scan without decoding
    * pixel data.
    */
  def frameCount(b: Array[Byte]): Int = {
    if (!isGif(b)) return -1
    val reader = ImageIO.getImageReadersByFormatName("gif").next()
    val iis = new MemoryCacheImageInputStream(new ByteArrayInputStream(b))
    try {
      reader.setInput(iis, false, true)
      val n = reader.getNumImages(true)
      if (n <= 0) -1 else n // match gifInfo/decodeFrames: no frames = unreadable
    } catch { case _: Exception => -1 }
    finally { reader.dispose(); iis.close() }
  }

  /** Every frame decoded to packed-RGB [[ImageCodec.Px]], in stream
    * order; null when not a GIF / unreadable.
    */
  def decodeFrames(b: Array[Byte]): Array[ImageCodec.Px] = {
    if (!isGif(b)) return null
    val reader = ImageIO.getImageReadersByFormatName("gif").next()
    val iis = new MemoryCacheImageInputStream(new ByteArrayInputStream(b))
    try {
      reader.setInput(iis, false, true)
      val n = reader.getNumImages(true)
      if (n <= 0) return null // truncated before the first frame
      val out = new Array[ImageCodec.Px](n)
      var i = 0
      while (i < n) {
        val img = reader.read(i, null)
        val w = img.getWidth; val h = img.getHeight
        val rgb = new Array[Int](w * h)
        img.getRGB(0, 0, w, h, rgb, 0, w)
        var j = 0
        while (j < rgb.length) { rgb(j) &= 0xffffff; j += 1 }
        out(i) = ImageCodec.Px(w, h, rgb)
        i += 1
      }
      out
    } catch { case _: Exception => null }
    finally { reader.dispose(); iis.close() }
  }

  /** Every frame as PNG bytes (the per-frame payload a downstream
    * image stage consumes); null when not a GIF.
    */
  def framesPng(b: Array[Byte]): Array[Array[Byte]] = {
    val px = decodeFrames(b)
    if (px == null) null else px.map(ImageCodec.encodePng)
  }

  /** Write an animated GIF from RGB frames (all must share one size).
    * Uses the JDK writer's sequence API; each frame carries its own
    * local palette, so arbitrary (≤256-color-per-frame) input survives
    * exactly.
    */
  def encode(frames: Seq[ImageCodec.Px]): Array[Byte] = {
    require(frames.nonEmpty, "encode: no frames")
    require(frames.forall(f => f.w == frames.head.w && f.h == frames.head.h),
      "encode: frames must share one size")
    val writer = ImageIO.getImageWritersByFormatName("gif").next()
    val bos = new ByteArrayOutputStream()
    val ios = new MemoryCacheImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      frames.foreach { f =>
        val img = new java.awt.image.BufferedImage(
          f.w, f.h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        img.setRGB(0, 0, f.w, f.h, f.rgb, 0, f.w)
        writer.writeToSequence(new IIOImage(img, null, null), writer.getDefaultWriteParam)
      }
      writer.endWriteSequence()
    } finally {
      writer.dispose(); ios.close()
    }
    bos.toByteArray
  }

  /** The web-safe color cube (216 colors): GIF-exact by construction. */
  @inline private def webSafe(i: Long): Int = FrameAnalysis.webSafe(i)

  /** Deterministic animated-GIF fixture: `nFrames` solid web-safe
    * frames (frame k is color `webSafe(seed + k)`) at w×h. Solid
    * palette colors round-trip GIF quantization exactly, so frame
    * pixels AND metadata are closed-form functions of the inputs.
    */
  def synthGif(seed: Long, nFrames: Int, w: Int, h: Int): Array[Byte] = {
    require(nFrames > 0 && w > 0 && h > 0,
      s"synthGif: bad shape ${nFrames}x${w}x$h")
    encode((0 until nFrames).map { k =>
      ImageCodec.Px(w, h, Array.fill(w * h)(webSafe(seed + k)))
    })
  }

  /** [n_frames, width, height] of a GIF payload; null otherwise. */
  def gifInfo(b: Array[Byte]): Array[Long] = {
    if (!isGif(b)) return null
    val reader = ImageIO.getImageReadersByFormatName("gif").next()
    val iis = new MemoryCacheImageInputStream(new ByteArrayInputStream(b))
    try {
      reader.setInput(iis, false, true)
      val n = reader.getNumImages(true)
      if (n <= 0) null
      else Array(n.toLong, reader.getWidth(0).toLong, reader.getHeight(0).toLong)
    } catch { case _: Exception => null }
    finally { reader.dispose(); iis.close() }
  }

  /** Mean luminance (0-255, rounded long) of frame `idx`; -1 when out
    * of range / not a GIF. For the solid-color fixture this is the
    * exact integer luma of the frame color — closed-form for the
    * oracle: `luma = (77·r + 150·g + 29·b) >> 8` on webSafe(seed+k).
    */
  def frameLuma(b: Array[Byte], idx: Int): Long = {
    val frames = decodeFrames(b)
    if (frames == null || idx < 0 || idx >= frames.length) return -1L
    meanLuma(frames(idx))
  }

  /** Mean luminance of every frame in stream order (ONE container
    * decode for the whole sequence — the per-frame-analysis shape a
    * video pipeline wants); null when not a GIF.
    */
  def frameLumas(b: Array[Byte]): Array[Long] = {
    val frames = decodeFrames(b)
    if (frames == null) null else frames.map(meanLuma)
  }

  /** Motion signal between consecutive frames: entry k is the mean
    * over pixels of |Δr|+|Δg|+|Δb| between frames k and k+1 (length
    * n_frames-1). The scene-cut detector's raw input — one container
    * decode for the whole sequence. Null when not a GIF, single-frame,
    * or frame geometries differ.
    */
  def frameMotion(b: Array[Byte]): Array[Long] = {
    val frames = decodeFrames(b)
    if (frames == null || frames.length < 2) return null
    motionOf(frames)
  }

  /** The shared consecutive-frame delta fold ([[FrameAnalysis.motion]]);
    * null when any adjacent pair's geometries differ. Callers guard
    * length >= 2.
    */
  private def motionOf(frames: Array[ImageCodec.Px]): Array[Long] =
    FrameAnalysis.motion(frames)

  /** Both analysis arrays from ONE container decode: `(lumas, motion)`
    * — the fused form [[graft.functions.GifAnalyzeExpr]] projects when
    * a query needs per-frame luma AND the cut signal (two separate
    * expression calls would parse + LZW-decode the container twice per
    * row). Motion is null (not empty) for single-frame sequences,
    * matching [[frameMotion]]; both null when not a GIF.
    */
  def analyze(b: Array[Byte]): (Array[Long], Array[Long]) = {
    val frames = decodeFrames(b)
    if (frames == null) return null
    val lumas = frames.map(meanLuma)
    if (frames.length < 2) (lumas, null) else (lumas, motionOf(frames))
  }

  private def meanLuma(f: ImageCodec.Px): Long = FrameAnalysis.meanLuma(f)
}
