package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** Dev probe (not a gate): decode MB/s of the from-scratch zstd/xz
  * decoders vs the native/jar implementations on the same frames.
  * Run explicitly: testOnly graft.sources.CodecThroughputProbe
  */
class CodecThroughputProbe extends AnyFunSuite {
  private def mkData(n: Int): Array[Byte] = {
    val sb = new StringBuilder
    var i = 0
    while (sb.length < n) { sb.append(s"""{"id": $i, "text": "document $i body with shared prefix and words", "lang": "en"}\n"""); i += 1 }
    sb.toString.getBytes("UTF-8")
  }

  private def time(reps: Int)(f: => Unit): Double = {
    f // warmup
    f
    val t0 = System.nanoTime()
    var i = 0
    while (i < reps) { f; i += 1 }
    (System.nanoTime() - t0) / 1e9 / reps
  }

  test("decode throughput: ours vs reference implementations") {
    val data = mkData(1024 * 1024)
    val mb = data.length / 1e6
    val zframe = com.github.luben.zstd.Zstd.compress(data, 3)
    val xframe = {
      val bos = new java.io.ByteArrayOutputStream()
      val out = new org.tukaani.xz.XZOutputStream(bos, new org.tukaani.xz.LZMA2Options(6))
      out.write(data); out.finish(); out.close()
      bos.toByteArray
    }
    val gz = GzipShard.gzipMembers(Seq(data))

    val tZstdMine = time(3)(ZstdCodec.decompress(zframe))
    val tZstdJni = time(3)(com.github.luben.zstd.Zstd.decompress(zframe, data.length))
    val tZstdAir = time(3) { // aircompressor: the PURE-JAVA zstd on the classpath
      val d = new io.airlift.compress.zstd.ZstdDecompressor()
      val out = new Array[Byte](data.length)
      d.decompress(zframe, 0, zframe.length, out, 0, out.length)
    }
    val tXzMine = time(3)(XzCodec.decompress(xframe))
    val tXzJar = time(3) {
      val in = new org.tukaani.xz.XZInputStream(new java.io.ByteArrayInputStream(xframe))
      val buf = new Array[Byte](65536)
      while (in.read(buf) > 0) {}
      in.close()
    }
    val tGzip = time(3)(GzipShard.gunzipAll(gz))
    val bzframe = {
      val bos = new java.io.ByteArrayOutputStream()
      val out = new org.apache.commons.compress.compressors.bzip2.BZip2CompressorOutputStream(bos, 9)
      out.write(data); out.close()
      bos.toByteArray
    }
    val tBz2Mine = time(3)(BzipCodec.decompress(bzframe))
    val tBz2Cc = time(3) {
      val in = new org.apache.commons.compress.compressors.bzip2.BZip2CompressorInputStream(
        new java.io.ByteArrayInputStream(bzframe), true)
      val buf = new Array[Byte](65536)
      while (in.read(buf) > 0) {}
      in.close()
    }
    val tBz2Enc = time(3)(BzipCodec.compress(data, 9))
    val lzframe = Lz4Codec.compressFrame(data)
    val tLz4Mine = time(5)(Lz4Codec.decompress(lzframe))
    val tLz4Jar = time(5) {
      val in = new net.jpountz.lz4.LZ4FrameInputStream(new java.io.ByteArrayInputStream(lzframe))
      val buf = new Array[Byte](65536)
      while (in.read(buf) > 0) {}
      in.close()
    }
    val tLz4Enc = time(5)(Lz4Codec.compressFrame(data))
    val snframe = SnappyCodec.compressFramed(data)
    val tSnMine = time(5)(SnappyCodec.decompress(snframe))
    val tSnJar = time(5) {
      val in = new org.xerial.snappy.SnappyFramedInputStream(
        new java.io.ByteArrayInputStream(snframe), true)
      val buf = new Array[Byte](65536)
      while (in.read(buf) > 0) {}
      in.close()
    }
    val tSnEnc = time(5)(SnappyCodec.compressFramed(data))
    // pure-JAVA peer at raw-block grain (airlift): the honest
    // comparison — the framed jar numbers above are native-backed
    val rawBlock = SnappyCodec.encodeRaw(data, 0, data.length)
    val tSnRawMine = time(5)(SnappyCodec.decodeRaw(rawBlock))
    val tSnRawAir = time(5) {
      val d = new io.airlift.compress.snappy.SnappyDecompressor()
      val out = new Array[Byte](data.length)
      d.decompress(rawBlock, 0, rawBlock.length, out, 0, out.length)
    }
    // brotli: no JVM implementation exists on this classpath to race,
    // so the number stands alone — the frame is pinned REAL encoder
    // output (quality 9) over the same jsonl shape as `data`
    val brFrame = {
      val in = getClass.getResourceAsStream("/brotli/probe_1mb_q9.br")
      try in.readAllBytes() finally in.close()
    }
    val brRawLen = BrotliCodec.decompress(brFrame).length
    val tBrMine = time(5)(BrotliCodec.decompress(brFrame))
    println(f"[throughput] input ${mb}%.1f MB")
    println(f"[throughput] br   ours   ${brRawLen / 1e6 / tBrMine}%8.1f MB/s  (decode; no JVM peer exists)")
    println(f"[throughput] lz4  ours   ${mb / tLz4Mine}%8.1f MB/s")
    println(f"[throughput] lz4  jar    ${mb / tLz4Jar}%8.1f MB/s  (lz4-java, JNI-or-java)")
    println(f"[throughput] lz4  encode ${mb / tLz4Enc}%8.1f MB/s  (ours)")
    println(f"[throughput] snap ours   ${mb / tSnMine}%8.1f MB/s")
    println(f"[throughput] snap jar    ${mb / tSnJar}%8.1f MB/s  (snappy-java, native)")
    println(f"[throughput] snap encode ${mb / tSnEnc}%8.1f MB/s  (ours)")
    println(f"[throughput] snap raw ours ${mb / tSnRawMine}%6.1f MB/s")
    println(f"[throughput] snap raw air  ${mb / tSnRawAir}%6.1f MB/s  (pure-java airlift)")
    println(f"[throughput] bz2  ours   ${mb / tBz2Mine}%8.1f MB/s")
    println(f"[throughput] bz2  cc     ${mb / tBz2Cc}%8.1f MB/s  (pure-java commons-compress)")
    println(f"[throughput] bz2  encode ${mb / tBz2Enc}%8.1f MB/s  (ours, fixture writer)")
    println(f"[throughput] zstd ours   ${mb / tZstdMine}%8.1f MB/s")
    println(f"[throughput] zstd jni    ${mb / tZstdJni}%8.1f MB/s  (native)")
    println(f"[throughput] zstd airlift${mb / tZstdAir}%8.1f MB/s  (pure-java)")
    println(f"[throughput] xz   ours   ${mb / tXzMine}%8.1f MB/s")
    println(f"[throughput] xz   jar    ${mb / tXzJar}%8.1f MB/s  (pure-java)")
    println(f"[throughput] gzip jdk    ${mb / tGzip}%8.1f MB/s  (native zlib)")
    assert(ZstdCodec.decompress(zframe).length === data.length)
  }
}
