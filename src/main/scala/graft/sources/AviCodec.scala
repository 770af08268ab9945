package graft.sources

import java.io.ByteArrayInputStream
import java.nio.{ByteBuffer, ByteOrder}
import javax.imageio.ImageIO

/** Real AVI video container, zero new dependencies: RIFF-AVI parse
  * and write in plain JDK arithmetic, with two frame codecs —
  * uncompressed DIB (`00db` chunks, BI_RGB bottom-up 24-bit, fully
  * deterministic byte-exact pixels) and Motion-JPEG (`00dc` chunks,
  * each frame a standalone JPEG the JDK's ImageIO decodes/encodes
  * natively). This is the classic pre-H.264 video interchange pair;
  * together with [[GifCodec]] it gives the engine two REAL moving-
  * picture containers, narrowing the [[Multimodal]] stub to
  * codec-bound formats only (H.264/VP9/AV1 need native libraries the
  * container lacks).
  *
  * Layout written (and tolerated when reading, plus unknown chunks
  * skipped by size): `RIFF('AVI ' LIST('hdrl' avih LIST('strl' strh
  * strf)) LIST('movi' 00db/00dc...) idx1)`. All sizes little-endian;
  * odd-size chunks pad one byte per RIFF. Malformed/truncated input →
  * null (never throws on the data path).
  *
  * Mirrors the reference's video handling, which shells out to a
  * codec binary (`app.py:248-285` re-encodes frames through JPEG —
  * exactly MJPEG's model: every frame an independent JPEG, no
  * inter-frame prediction, so frame extraction is chunk slicing).
  */
object AviCodec {

  private val FpsScale = 1 // strh.dwScale; dwRate is then frames/sec

  def isAvi(b: Array[Byte]): Boolean =
    b != null && b.length >= 12 &&
      b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
      b(8) == 'A' && b(9) == 'V' && b(10) == 'I' && b(11) == ' '

  // ------------------------------------------------------------------
  // Write path
  // ------------------------------------------------------------------

  private def fourcc(s: String): Int =
    (s(0) & 0xff) | ((s(1) & 0xff) << 8) | ((s(2) & 0xff) << 16) | ((s(3) & 0xff) << 24)

  private final class W {
    val buf = new java.io.ByteArrayOutputStream()
    def u32(v: Int): Unit = { buf.write(v & 0xff); buf.write((v >> 8) & 0xff); buf.write((v >> 16) & 0xff); buf.write((v >>> 24) & 0xff) }
    def u16(v: Int): Unit = { buf.write(v & 0xff); buf.write((v >> 8) & 0xff) }
    def tag(s: String): Unit = u32(fourcc(s))
    def bytes(b: Array[Byte]): Unit = buf.write(b, 0, b.length)
  }

  /** Row stride of a 24-bit DIB scanline: 3·w rounded up to 4 bytes. */
  @inline private def dibStride(w: Int): Int = (3 * w + 3) & ~3

  /** One frame as a BI_RGB bottom-up 24-bit DIB payload. */
  private def encodeDib(f: ImageCodec.Px): Array[Byte] = {
    val stride = dibStride(f.w)
    val out = new Array[Byte](stride * f.h)
    var y = 0
    while (y < f.h) {
      val srcRow = (f.h - 1 - y) * f.w // bottom-up
      var x = 0
      while (x < f.w) {
        val c = f.rgb(srcRow + x)
        val o = y * stride + 3 * x
        out(o) = (c & 0xff).toByte           // B
        out(o + 1) = ((c >> 8) & 0xff).toByte // G
        out(o + 2) = ((c >> 16) & 0xff).toByte // R
        x += 1
      }
      y += 1
    }
    out
  }

  private def decodeDib(payload: Array[Byte], w: Int, h: Int): ImageCodec.Px = {
    if (w <= 0 || h <= 0) return null
    val stride = dibStride(w)
    // Long arithmetic: hostile headers (e.g. w = h = 65536) overflow
    // stride*h and w*h to 0 in Int, sliding past a 32-bit guard and
    // crashing the pixel loop instead of yielding null
    if (stride.toLong * h > payload.length || w.toLong * h > Int.MaxValue) return null
    val rgb = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      val dstRow = (h - 1 - y) * w
      var x = 0
      while (x < w) {
        val o = y * stride + 3 * x
        rgb(dstRow + x) = ((payload(o + 2) & 0xff) << 16) |
          ((payload(o + 1) & 0xff) << 8) | (payload(o) & 0xff)
        x += 1
      }
      y += 1
    }
    ImageCodec.Px(w, h, rgb)
  }

  /** Write an AVI from RGB frames (all one size). `mjpeg = false` →
    * uncompressed DIB (byte-exact round trip); `mjpeg = true` → each
    * frame JPEG-encoded at `quality` (1-100) into `00dc` chunks.
    */
  def encode(frames: Seq[ImageCodec.Px], fps: Int, mjpeg: Boolean,
             quality: Int = 85): Array[Byte] = {
    require(frames.nonEmpty, "encode: no frames")
    require(fps > 0, s"encode: bad fps $fps")
    val w0 = frames.head.w; val h0 = frames.head.h
    require(frames.forall(f => f.w == w0 && f.h == h0),
      "encode: frames must share one size")

    val payloads: Seq[Array[Byte]] =
      if (mjpeg) frames.map(f => ImageCodec.encodeJpeg(f, quality))
      else frames.map(encodeDib)
    val ckId = if (mjpeg) "00dc" else "00db"
    val maxPayload = payloads.map(_.length).max

    // LIST movi body: sequence of padded frame chunks; remember each
    // chunk's offset from the 'movi' fourcc (the idx1 convention).
    val movi = new W
    movi.tag("movi")
    val offsets = payloads.map { p =>
      val off = movi.buf.size()
      movi.tag(ckId); movi.u32(p.length); movi.bytes(p)
      if ((p.length & 1) == 1) movi.buf.write(0)
      off
    }
    val moviBody = movi.buf.toByteArray

    val strf = new W // BITMAPINFOHEADER
    strf.u32(40); strf.u32(w0); strf.u32(h0); strf.u16(1); strf.u16(24)
    strf.u32(if (mjpeg) fourcc("MJPG") else 0)
    strf.u32(dibStride(w0) * h0); strf.u32(0); strf.u32(0); strf.u32(0); strf.u32(0)

    val strh = new W
    strh.tag("vids"); strh.tag(if (mjpeg) "MJPG" else "DIB ")
    strh.u32(0); strh.u16(0); strh.u16(0); strh.u32(0)
    strh.u32(FpsScale); strh.u32(fps) // dwScale, dwRate → rate/scale fps
    strh.u32(0); strh.u32(frames.length); strh.u32(maxPayload)
    strh.u32(-1); strh.u32(0)
    strh.u16(0); strh.u16(0); strh.u16(w0); strh.u16(h0) // rcFrame

    val strl = new W
    strl.tag("strl")
    strl.tag("strh"); strl.u32(56); strl.bytes(strh.buf.toByteArray)
    strl.tag("strf"); strl.u32(40); strl.bytes(strf.buf.toByteArray)
    val strlBody = strl.buf.toByteArray

    val avih = new W // MainAVIHeader
    avih.u32((1000000L / fps).toInt) // dwMicroSecPerFrame
    avih.u32(maxPayload * fps) // dwMaxBytesPerSec
    avih.u32(0); avih.u32(0x10) // padding, AVIF_HASINDEX
    avih.u32(frames.length); avih.u32(0); avih.u32(1) // totalFrames, initial, streams
    avih.u32(maxPayload); avih.u32(w0); avih.u32(h0)
    avih.u32(0); avih.u32(0); avih.u32(0); avih.u32(0) // reserved

    val hdrl = new W
    hdrl.tag("hdrl")
    hdrl.tag("avih"); hdrl.u32(56); hdrl.bytes(avih.buf.toByteArray)
    hdrl.tag("LIST"); hdrl.u32(strlBody.length); hdrl.bytes(strlBody)
    val hdrlBody = hdrl.buf.toByteArray

    val idx1 = new W
    payloads.zip(offsets).foreach { case (p, off) =>
      idx1.tag(ckId); idx1.u32(0x10) // AVIIF_KEYFRAME
      idx1.u32(off); idx1.u32(p.length)
    }
    val idx1Body = idx1.buf.toByteArray

    val riff = new W
    riff.tag("AVI ")
    riff.tag("LIST"); riff.u32(hdrlBody.length); riff.bytes(hdrlBody)
    riff.tag("LIST"); riff.u32(moviBody.length); riff.bytes(moviBody)
    riff.tag("idx1"); riff.u32(idx1Body.length); riff.bytes(idx1Body)
    val riffBody = riff.buf.toByteArray

    val out = new W
    out.tag("RIFF"); out.u32(riffBody.length); out.bytes(riffBody)
    out.buf.toByteArray
  }

  // ------------------------------------------------------------------
  // Read path
  // ------------------------------------------------------------------

  private final case class Parsed(nFrames: Long, width: Long, height: Long,
                                  fps: Long, mjpeg: Boolean,
                                  frames: Array[Array[Byte]])

  /** Single defensive walk of the chunk tree; null on any structural
    * problem. `wantFrames = false` skips payload copies (metadata-only
    * probes stay cheap on large containers).
    */
  private def parse(b: Array[Byte], wantFrames: Boolean): Parsed = {
    if (!isAvi(b)) return null
    try {
      val bb = ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN)
      val riffSize = bb.getInt(4)
      val end = math.min(b.length.toLong, 8L + (riffSize & 0xffffffffL)).toInt
      var width = -1L; var height = -1L; var total = -1L
      var rate = -1L; var scale = -1L; var mjpeg = false
      var strfW = -1; var strfH = -1
      val frames = if (wantFrames) scala.collection.mutable.ArrayBuffer.empty[Array[Byte]] else null

      // iterative walk with an explicit stack of (pos, limit) regions
      var stack = List((12, end))
      while (stack.nonEmpty) {
        var (pos, limit) = stack.head
        stack = stack.tail
        while (pos + 8 <= limit) {
          val id = bb.getInt(pos)
          val size = bb.getInt(pos + 4)
          if (size < 0 || pos + 8 + size > limit) { pos = limit } // truncated: stop this region
          else {
            if (id == fourcc("LIST")) {
              val listType = if (size >= 4) bb.getInt(pos + 8) else 0
              if (listType == fourcc("hdrl") || listType == fourcc("strl") ||
                  listType == fourcc("movi"))
                stack = (pos + 12, pos + 8 + size) :: stack
            } else if (id == fourcc("avih") && size >= 40) {
              total = bb.getInt(pos + 8 + 16) & 0xffffffffL
              width = bb.getInt(pos + 8 + 32) & 0xffffffffL
              height = bb.getInt(pos + 8 + 36) & 0xffffffffL
            } else if (id == fourcc("strh") && size >= 36) {
              if (bb.getInt(pos + 8) == fourcc("vids")) {
                val handler = bb.getInt(pos + 12)
                mjpeg = handler == fourcc("MJPG") || handler == fourcc("mjpg")
                scale = bb.getInt(pos + 8 + 20) & 0xffffffffL
                rate = bb.getInt(pos + 8 + 24) & 0xffffffffL
              }
            } else if (id == fourcc("strf") && size >= 24) {
              strfW = bb.getInt(pos + 8 + 4)
              strfH = bb.getInt(pos + 8 + 8)
              val comp = bb.getInt(pos + 8 + 16)
              if (comp == fourcc("MJPG") || comp == fourcc("mjpg")) mjpeg = true
            } else if (wantFrames &&
                       (id == fourcc("00db") || id == fourcc("00dc"))) {
              frames += java.util.Arrays.copyOfRange(b, pos + 8, pos + 8 + size)
            }
            pos += 8 + size + (size & 1)
          }
        }
      }
      if (width <= 0 && strfW > 0) width = strfW
      if (height <= 0 && strfH > 0) height = math.abs(strfH)
      // sane-dimension bound: header fields are untrusted u32s; a
      // 32768² frame is already far past anything this codec emits,
      // and rejecting here keeps every downstream Int product safe
      if (width <= 0 || height <= 0 || total < 0 ||
          width > (1 << 15) || height > (1 << 15)) return null
      val fps = if (scale > 0 && rate > 0) rate / scale else -1L
      Parsed(total, width, height, fps, mjpeg,
        if (wantFrames) frames.toArray else null)
    } catch { case _: Exception => null }
  }

  /** [n_frames, width, height, fps] of an AVI payload; null otherwise. */
  def aviInfo(b: Array[Byte]): Array[Long] = {
    val p = parse(b, wantFrames = false)
    if (p == null) null else Array(p.nFrames, p.width, p.height, p.fps)
  }

  /** Every frame decoded to packed-RGB [[ImageCodec.Px]], in stream
    * order — DIB chunks by arithmetic, MJPEG chunks via ImageIO; null
    * when not an AVI / unreadable / any frame fails to decode.
    */
  def decodeFrames(b: Array[Byte]): Array[ImageCodec.Px] = {
    val p = parse(b, wantFrames = true)
    if (p == null) null else decodeParsed(p)
  }

  private def decodeParsed(p: Parsed): Array[ImageCodec.Px] = {
    if (p.frames == null || p.frames.isEmpty) return null
    val out = new Array[ImageCodec.Px](p.frames.length)
    var i = 0
    while (i < out.length) {
      val payload = p.frames(i)
      val px =
        if (p.mjpeg) {
          try {
            val img = ImageIO.read(new ByteArrayInputStream(payload))
            if (img == null) null
            else {
              val w = img.getWidth; val h = img.getHeight
              val rgb = new Array[Int](w * h)
              img.getRGB(0, 0, w, h, rgb, 0, w)
              var j = 0
              while (j < rgb.length) { rgb(j) &= 0xffffff; j += 1 }
              ImageCodec.Px(w, h, rgb)
            }
          } catch { case _: Exception => null }
        } else {
          // same crash barrier as the MJPEG branch: a corrupt DIB must
          // yield null on the data path, never throw through the task
          try decodeDib(payload, p.width.toInt, p.height.toInt)
          catch { case _: Exception => null }
        }
      if (px == null) return null
      out(i) = px
      i += 1
    }
    out
  }

  /** Mean luminance of every frame in stream order (ONE container
    * walk); null when not an AVI.
    */
  def frameLumas(b: Array[Byte]): Array[Long] = {
    val frames = decodeFrames(b)
    if (frames == null) null else frames.map(FrameAnalysis.meanLuma)
  }

  /** Consecutive-frame motion (same fold as the GIF path,
    * [[FrameAnalysis.motion]]); null when not an AVI or single-frame.
    */
  def frameMotion(b: Array[Byte]): Array[Long] = {
    val frames = decodeFrames(b)
    if (frames == null || frames.length < 2) return null
    FrameAnalysis.motion(frames)
  }

  /** Both analysis arrays from ONE container decode. */
  def analyze(b: Array[Byte]): (Array[Long], Array[Long]) = {
    val frames = decodeFrames(b)
    if (frames == null) null else FrameAnalysis.analyze(frames)
  }

  /** Transcode any readable AVI to MJPEG-in-AVI at `quality` — the
    * reference's frame-wise JPEG re-encode (`app.py:248-285`) on a
    * real video container. Null when the input doesn't decode.
    */
  def toMjpeg(b: Array[Byte], fps: Int, quality: Int): Array[Byte] = {
    // ONE chunk-tree walk serves both the frames and the source fps —
    // a second metadata parse would double per-row container cost in
    // the transcode query
    val p = parse(b, wantFrames = true)
    if (p == null) return null
    val frames = decodeParsed(p)
    if (frames == null) return null
    val useFps = if (p.fps > 0) p.fps.toInt else fps
    encode(frames.toIndexedSeq, useFps, mjpeg = true, quality = quality)
  }

  /** Deterministic AVI fixture: `nFrames` solid web-safe DIB frames
    * (frame k is color `FrameAnalysis.webSafe(seed + k)`) at w×h,
    * 10 fps. Uncompressed, so decoded pixels are byte-exact and frame
    * metadata + lumas are closed-form for the oracle — the AVI twin of
    * [[GifCodec.synthGif]].
    */
  def synthAvi(seed: Long, nFrames: Int, w: Int, h: Int): Array[Byte] = {
    require(nFrames > 0 && w > 0 && h > 0,
      s"synthAvi: bad shape ${nFrames}x${w}x$h")
    encode((0 until nFrames).map { k =>
      ImageCodec.Px(w, h, Array.fill(w * h)(FrameAnalysis.webSafe(seed + k)))
    }, fps = 10, mjpeg = false)
  }
}
