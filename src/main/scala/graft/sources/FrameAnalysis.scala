package graft.sources

/** Shared per-frame analysis folds for the moving-picture codecs
  * ([[GifCodec]], [[AviCodec]]): mean luminance and consecutive-frame
  * motion over decoded [[ImageCodec.Px]] sequences. One home for the
  * arithmetic so the GIF and AVI paths are bit-identical on the same
  * frames — the keyframe/scene-cut query layer composes either.
  */
object FrameAnalysis {

  /** Integer mean luminance (0-255) of one frame: the fixed-point
    * BT.601-ish weights `(77·r + 150·g + 29·b) >> 8`, rounded mean.
    */
  def meanLuma(f: ImageCodec.Px): Long = {
    var sum = 0L
    var i = 0
    while (i < f.rgb.length) {
      val c = f.rgb(i)
      sum += (77 * ((c >> 16) & 0xff) + 150 * ((c >> 8) & 0xff) + 29 * (c & 0xff)) >> 8
      i += 1
    }
    math.round(sum.toDouble / f.rgb.length)
  }

  /** Motion signal between consecutive frames: entry k is the mean
    * over pixels of |Δr|+|Δg|+|Δb| between frames k and k+1 (length
    * n-1). Null when any adjacent pair's geometries differ. Callers
    * guard length >= 2.
    */
  def motion(frames: Array[ImageCodec.Px]): Array[Long] = {
    val out = new Array[Long](frames.length - 1)
    var k = 1
    while (k < frames.length) {
      val a = frames(k - 1).rgb; val c = frames(k).rgb
      if (a.length != c.length) return null
      var sum = 0L; var i = 0
      while (i < a.length) {
        val x = a(i); val y = c(i)
        sum += math.abs(((x >> 16) & 0xff) - ((y >> 16) & 0xff)) +
          math.abs(((x >> 8) & 0xff) - ((y >> 8) & 0xff)) +
          math.abs((x & 0xff) - (y & 0xff))
        i += 1
      }
      out(k - 1) = math.round(sum.toDouble / a.length)
      k += 1
    }
    out
  }

  /** Both analysis arrays from ONE decoded sequence: `(lumas, motion)`
    * — motion null (not empty) for single-frame sequences.
    */
  def analyze(frames: Array[ImageCodec.Px]): (Array[Long], Array[Long]) = {
    val lumas = frames.map(meanLuma)
    if (frames.length < 2) (lumas, null) else (lumas, motion(frames))
  }

  /** The web-safe color cube (216 colors): palette-exact under GIF
    * quantization and byte-exact under uncompressed DIB — the shared
    * synth-fixture color ramp.
    */
  @inline def webSafe(i: Long): Int = {
    val v = java.lang.Math.floorMod(i, 216L).toInt
    ((v / 36) * 0x33 << 16) | (((v / 6) % 6) * 0x33 << 8) | ((v % 6) * 0x33)
  }
}
