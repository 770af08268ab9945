package graft.sources

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

/** Gzipped-JSONL shard ingestion — the Pile/RedPajama shard form
  * (`.jsonl.gz`: one JSON object per line, the whole file one or more
  * concatenated gzip members). Reuses the WARC layer's
  * member-iterating `GZIPInputStream` discipline ([[WarcCodec]]);
  * the `text`-field convention is what public pretraining shards use.
  * zstd shards (`.jsonl.zst`) and xz shards (`.jsonl.xz`) take the
  * same surface through the from-scratch [[ZstdCodec]] and
  * [[XzCodec]] — all three compressed shard front doors share this
  * file's text-field scanner and null contract.
  *
  * Scale shape: one shard = one row = one member-iterating
  * decompress — embarrassingly parallel across shards, no Spark
  * state; at 100 TB the shard grain IS the parallelism grain
  * (RedPajama ships ~GB-sized shards), so `maxPartitionBytes` on the
  * scan is the only knob.
  */
object GzipShard {

  def isGzip(b: Array[Byte]): Boolean =
    b != null && b.length >= 2 && (b(0) & 0xff) == 0x1f && (b(1) & 0xff) == 0x8b

  /** Concatenated-member decompress; damaged trailing members yield
    * the bytes decoded so far (the WARC partial-parse promise). Null
    * for non-gzip input.
    */
  def gunzipAll(b: Array[Byte]): Array[Byte] = {
    if (!isGzip(b)) return null
    val out = new ByteArrayOutputStream(math.max(64, b.length * 4))
    var in: GZIPInputStream = null
    try {
      in = new GZIPInputStream(new ByteArrayInputStream(b), 8192)
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n > 0) { out.write(buf, 0, n); n = in.read(buf) }
    } catch { case _: Exception => () }
    finally {
      if (in != null) try in.close() catch { case _: Exception => () }
    }
    out.toByteArray
  }

  /** (offset, length) of every gzip member — the shard SPLIT points.
    * Gzip carries no size fields, so finding a member's end requires
    * inflating it (output discarded): header parse per the RFC 1952
    * field flags, raw-deflate walk with `Inflater(nowrap)`, 8-byte
    * CRC/ISIZE trailer. O(bytes) once per shard at planning time;
    * zstd/xz shards split cheaper ([[ZstdCodec.frameOffsets]],
    * [[XzCodec.streamOffsets]] walk declared sizes without inflating).
    * Loud on damage (a splitter must not silently mis-split).
    */
  def memberOffsets(b: Array[Byte]): Array[(Long, Long)] = {
    require(isGzip(b), "not gzip")
    val out = Vector.newBuilder[(Long, Long)]
    var p = 0
    while (p < b.length) {
      val start = p
      require(p + 10 <= b.length && (b(p) & 0xff) == 0x1f && (b(p + 1) & 0xff) == 0x8b,
        s"gzip: bad member header at $p")
      require((b(p + 2) & 0xff) == 8, "gzip: unknown compression method")
      val flg = b(p + 3) & 0xff
      p += 10
      if ((flg & 4) != 0) { // FEXTRA
        require(p + 2 <= b.length, "gzip: truncated FEXTRA")
        p += 2 + (((b(p) & 0xff)) | ((b(p + 1) & 0xff) << 8))
      }
      if ((flg & 8) != 0) { while (p < b.length && b(p) != 0) p += 1; p += 1 } // FNAME
      if ((flg & 16) != 0) { while (p < b.length && b(p) != 0) p += 1; p += 1 } // FCOMMENT
      if ((flg & 2) != 0) p += 2 // FHCRC
      require(p <= b.length, "gzip: truncated member header")
      val inf = new java.util.zip.Inflater(true)
      try {
        inf.setInput(b, p, b.length - p)
        val sink = new Array[Byte](8192)
        while (!inf.finished()) {
          val n = inf.inflate(sink)
          if (n == 0 && !inf.finished())
            throw new IllegalArgumentException(s"gzip: truncated deflate stream at member $start")
        }
        p = b.length - inf.getRemaining
      } catch {
        case e: java.util.zip.DataFormatException =>
          throw new IllegalArgumentException(s"gzip: bad deflate data at member $start: ${e.getMessage}")
      } finally inf.end()
      p += 8 // CRC32 + ISIZE trailer
      require(p <= b.length, s"gzip: truncated trailer at member $start")
      out += ((start.toLong, (p - start).toLong))
    }
    out.result().toArray
  }

  /** One gzip member per part, concatenated (close() per member —
    * finish() alone leaks the native Deflater, see WarcCodec).
    */
  def gzipMembers(parts: Seq[Array[Byte]]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    parts.foreach { p =>
      val gz = new GZIPOutputStream(out)
      gz.write(p)
      gz.close()
    }
    out.toByteArray
  }

  /** Extract one top-level `"text"` string member from a JSON line —
    * a bounded scanner with full JSON string-escape handling, not a
    * whole-document parse (the dispatch hot path wants one codegen'd
    * pass; the oracle-gated q_jsonl_gz uses the engine's real
    * `from_json` for the schema-true read). Null when the line has no
    * parseable text member.
    */
  private[sources] def textField(line: String): String = {
    val key = "\"text\""
    var at = line.indexOf(key)
    while (at >= 0) {
      var i = at + key.length
      val n = line.length
      while (i < n && (line.charAt(i) == ' ' || line.charAt(i) == '\t')) i += 1
      if (i < n && line.charAt(i) == ':') {
        i += 1
        while (i < n && (line.charAt(i) == ' ' || line.charAt(i) == '\t')) i += 1
        if (i < n && line.charAt(i) == '"') {
          i += 1
          val sb = new java.lang.StringBuilder()
          while (i < n) {
            val c = line.charAt(i)
            if (c == '"') return sb.toString
            else if (c == '\\' && i + 1 < n) {
              line.charAt(i + 1) match {
                case '"' => sb.append('"'); i += 2
                case '\\' => sb.append('\\'); i += 2
                case '/' => sb.append('/'); i += 2
                case 'n' => sb.append('\n'); i += 2
                case 't' => sb.append('\t'); i += 2
                case 'r' => sb.append('\r'); i += 2
                case 'b' => sb.append('\b'); i += 2
                case 'f' => sb.append('\f'); i += 2
                case 'u' if i + 5 < n =>
                  try {
                    sb.append(Integer.parseInt(line.substring(i + 2, i + 6), 16).toChar)
                    i += 6
                  } catch { case _: NumberFormatException => sb.append(c); i += 1 }
                case _ => sb.append(c); i += 1
              }
            } else { sb.append(c); i += 1 }
          }
          return null // unterminated string
        }
      }
      at = line.indexOf(key, at + 1)
    }
    null
  }

  /** `.jsonl.gz` shard → newline-joined `text` fields of its lines —
    * the one-projection dispatch branch (lines without a text member
    * skip). Null — not "" — when nothing decodes (first member
    * damaged) or no line carries a text member, matching the codec
    * null-on-undecodable contract so broken shards don't flow
    * downstream as empty documents.
    */
  def jsonlGzText(b: Array[Byte]): String = {
    val raw = gunzipAll(b)
    if (raw == null || raw.length == 0) return null
    val texts = new String(raw, UTF_8).split("\n")
      .iterator.map(textField).filter(_ != null).toSeq
    if (texts.isEmpty) null else texts.mkString("\n")
  }

  /** Deterministic `.jsonl.gz` fixture: `nMembers` gzip members, each
    * `linesPer` JSON lines — line l of member m carries id
    * `seed·1000 + m·10 + l`, a text with an escaped quote and tab
    * (exercising string unescape both in `from_json` and the
    * dispatch scanner), a 2-way lang, and an integer score.
    */
  def synthJsonlGz(seed: Long, nMembers: Int, linesPer: Int): Array[Byte] = {
    val parts = (0 until math.max(1, nMembers)).map { m =>
      val sb = new java.lang.StringBuilder()
      (0 until math.max(1, linesPer)).foreach { l =>
        sb.append("{\"id\": ").append(seed * 1000 + m * 10 + l)
          .append(", \"text\": \"doc ").append(seed).append(" m").append(m)
          .append(" l").append(l).append(" say \\\"hi\\\"\\tok\"")
          .append(", \"lang\": \"").append(if ((m + l) % 2 == 0) "en" else "fr")
          .append("\", \"score\": ").append((seed + m + l) % 100).append("}\n")
      }
      sb.toString.getBytes(UTF_8)
    }
    gzipMembers(parts)
  }
}
