package graft.sources

import java.io.ByteArrayOutputStream

/** Pure-JVM Avro object-container codec — the remaining common
  * interchange format next to the gated ORC/CSV/JSONL round trips.
  * Implements the public Avro 1.11 spec: `Obj\x01` magic, file
  * metadata map (`avro.schema` JSON, `avro.codec`), 16-byte sync
  * marker, data blocks of (record-count, byte-size, payload, sync),
  * zigzag-varint longs, little-endian IEEE floats/doubles,
  * length-prefixed strings/bytes, union-index-prefixed nullables.
  *
  * Subset (loud on everything else): top-level `record` schemas whose
  * fields are primitives (`boolean int long float double string
  * bytes`) or nullable unions `["null", <primitive>]`; codecs `null`
  * and `deflate` (RAW deflate, no zlib wrapper — the spec's choice);
  * schema attributes beyond name/type/fields are ignored. Reader is
  * generic over that subset; [[synthAvro]] writes the deterministic
  * fixture the oracle gate replays.
  */
object AvroCodec {

  sealed abstract class AType(val name: String)
  case object ABool extends AType("boolean")
  case object AInt extends AType("int")
  case object ALong extends AType("long")
  case object AFloat extends AType("float")
  case object ADouble extends AType("double")
  case object AString extends AType("string")
  case object ABytes extends AType("bytes")

  final case class Field(name: String, tpe: AType, nullable: Boolean)
  final case class Schema(name: String, fields: Vector[Field])

  final case class Container(schema: Schema, codec: String, nBlocks: Int,
                             records: Vector[Array[Any]])

  def isAvro(b: Array[Byte]): Boolean =
    b != null && b.length >= 4 && b(0) == 'O' && b(1) == 'b' && b(2) == 'j' && b(3) == 1

  // ---------------------------------------------------------------
  // varint / zigzag
  // ---------------------------------------------------------------

  private final class Cursor(val b: Array[Byte]) { var at = 0 }

  private def readVarLong(c: Cursor): Long = {
    var shift = 0
    var acc = 0L
    var more = true
    while (more) {
      require(c.at < c.b.length, "avro: truncated varint")
      require(shift <= 63, "avro: varint too long")
      val v = c.b(c.at) & 0xff
      c.at += 1
      acc |= (v & 0x7fL) << shift
      shift += 7
      more = (v & 0x80) != 0
    }
    (acc >>> 1) ^ -(acc & 1) // zigzag decode
  }

  private def writeVarLong(out: ByteArrayOutputStream, v0: Long): Unit = {
    var v = (v0 << 1) ^ (v0 >> 63) // zigzag encode
    while ((v & ~0x7fL) != 0) { out.write(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
    out.write(v.toInt)
  }

  private def readBytes(c: Cursor): Array[Byte] = {
    val n = readVarLong(c)
    require(n >= 0 && c.at + n <= c.b.length, s"avro: bad byte-run length $n")
    val out = java.util.Arrays.copyOfRange(c.b, c.at, c.at + n.toInt)
    c.at += n.toInt
    out
  }

  // ---------------------------------------------------------------
  // minimal JSON (schema subset only)
  // ---------------------------------------------------------------

  /** Tiny recursive-descent JSON reader for the schema document:
    * objects, arrays, strings (with escapes), numbers, literals.
    * Returns Map/Vector/String/Double/Boolean/null.
    */
  private[sources] def parseJson(s: String): Any = {
    var i = 0
    def ws(): Unit = while (i < s.length && Character.isWhitespace(s.charAt(i))) i += 1
    def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"avro schema json: $msg at $i")
    def value(): Any = {
      ws()
      if (i >= s.length) fail("eof")
      s.charAt(i) match {
        case '{' =>
          i += 1; ws()
          val m = Map.newBuilder[String, Any]
          if (i < s.length && s.charAt(i) == '}') { i += 1 }
          else {
            var go = true
            while (go) {
              ws()
              val k = str()
              ws(); if (i >= s.length || s.charAt(i) != ':') fail("expected :"); i += 1
              m += k -> value()
              ws()
              if (i < s.length && s.charAt(i) == ',') { i += 1 }
              else if (i < s.length && s.charAt(i) == '}') { i += 1; go = false }
              else fail("expected , or }")
            }
          }
          m.result()
        case '[' =>
          i += 1; ws()
          val v = Vector.newBuilder[Any]
          if (i < s.length && s.charAt(i) == ']') { i += 1 }
          else {
            var go = true
            while (go) {
              v += value()
              ws()
              if (i < s.length && s.charAt(i) == ',') { i += 1 }
              else if (i < s.length && s.charAt(i) == ']') { i += 1; go = false }
              else fail("expected , or ]")
            }
          }
          v.result()
        case '"' => str()
        case 't' if s.startsWith("true", i) => i += 4; true
        case 'f' if s.startsWith("false", i) => i += 5; false
        case 'n' if s.startsWith("null", i) => i += 4; null
        case c if c == '-' || (c >= '0' && c <= '9') =>
          val st = i
          while (i < s.length && "0123456789+-.eE".indexOf(s.charAt(i)) >= 0) i += 1
          s.substring(st, i).toDouble
        case c => fail(s"unexpected '$c'")
      }
    }
    def str(): String = {
      if (i >= s.length || s.charAt(i) != '"') fail("expected string")
      i += 1
      val sb = new StringBuilder
      while (i < s.length && s.charAt(i) != '"') {
        val c = s.charAt(i)
        if (c == '\\' && i + 1 < s.length) {
          i += 1
          s.charAt(i) match {
            case 'n' => sb.append('\n'); i += 1
            case 't' => sb.append('\t'); i += 1
            case 'r' => sb.append('\r'); i += 1
            case 'b' => sb.append('\b'); i += 1
            case 'f' => sb.append('\f'); i += 1
            case 'u' =>
              require(i + 4 < s.length, "avro schema json: bad \\u")
              sb.append(Integer.parseInt(s.substring(i + 1, i + 5), 16).toChar); i += 5
            case o => sb.append(o); i += 1
          }
        } else { sb.append(c); i += 1 }
      }
      if (i >= s.length) fail("unterminated string")
      i += 1
      sb.toString
    }
    val v = value()
    ws()
    require(i == s.length, "avro schema json: trailing content")
    v
  }

  private val Primitives: Map[String, AType] =
    Seq(ABool, AInt, ALong, AFloat, ADouble, AString, ABytes).map(t => t.name -> t).toMap

  private[sources] def parseSchema(json: String): Schema = {
    val root = parseJson(json) match {
      case m: Map[_, _] => m.asInstanceOf[Map[String, Any]]
      case _ => throw new IllegalArgumentException("avro: schema root must be a record object")
    }
    require(root.get("type").contains("record"), "avro: only record schemas in subset")
    val name = root.get("name") match {
      case Some(s: String) => s
      case _ => throw new IllegalArgumentException("avro: record needs a name")
    }
    val fields = root.get("fields") match {
      case Some(fs: Vector[_]) => fs.map {
        case f: Map[_, _] =>
          val fm = f.asInstanceOf[Map[String, Any]]
          val fname = fm.get("name") match {
            case Some(s: String) => s
            case _ => throw new IllegalArgumentException("avro: field needs a name")
          }
          fm.get("type") match {
            case Some(t: String) =>
              Field(fname, Primitives.getOrElse(t,
                throw new IllegalArgumentException(s"avro: type '$t' out of subset")), nullable = false)
            case Some(u: Vector[_]) =>
              require(u.length == 2 && u(0) == "null" && u(1).isInstanceOf[String],
                s"avro: only [\"null\", primitive] unions in subset (field $fname)")
              val t = u(1).asInstanceOf[String]
              Field(fname, Primitives.getOrElse(t,
                throw new IllegalArgumentException(s"avro: type '$t' out of subset")), nullable = true)
            case other => throw new IllegalArgumentException(
              s"avro: field type $other out of subset (field $fname)")
          }
        case _ => throw new IllegalArgumentException("avro: field must be an object")
      }.toVector
      case _ => throw new IllegalArgumentException("avro: record needs fields")
    }
    Schema(name, fields)
  }

  // ---------------------------------------------------------------
  // read
  // ---------------------------------------------------------------

  private def readValue(c: Cursor, t: AType): Any = t match {
    case ABool =>
      require(c.at < c.b.length, "avro: truncated boolean")
      val v = c.b(c.at); c.at += 1; v != 0
    case AInt => readVarLong(c).toInt
    case ALong => readVarLong(c)
    case AFloat =>
      require(c.at + 4 <= c.b.length, "avro: truncated float")
      val bits = (c.b(c.at) & 0xff) | ((c.b(c.at + 1) & 0xff) << 8) |
        ((c.b(c.at + 2) & 0xff) << 16) | ((c.b(c.at + 3) & 0xff) << 24)
      c.at += 4
      java.lang.Float.intBitsToFloat(bits)
    case ADouble =>
      require(c.at + 8 <= c.b.length, "avro: truncated double")
      var bits = 0L
      var k = 0
      while (k < 8) { bits |= (c.b(c.at + k) & 0xffL) << (8 * k); k += 1 }
      c.at += 8
      java.lang.Double.longBitsToDouble(bits)
    case AString => new String(readBytes(c), java.nio.charset.StandardCharsets.UTF_8)
    case ABytes => readBytes(c)
  }

  /** Parse a container: schema, codec, block count, all records (field
    * values in schema order; null for absent union values). Throws
    * typed messages on malformed input; expression layers null-guard.
    */
  def read(bytes: Array[Byte]): Container = {
    require(isAvro(bytes), "avro: bad magic")
    val c = new Cursor(bytes)
    c.at = 4
    // file metadata map: series of blocks, 0-count terminates
    var meta = Map.empty[String, Array[Byte]]
    var n = readVarLong(c)
    while (n != 0) {
      require(n > -1000000 && n < 1000000, s"avro: implausible meta block $n")
      val cnt = math.abs(n)
      if (n < 0) readVarLong(c) // negative count: byte size follows
      var k = 0L
      while (k < cnt) {
        val key = new String(readBytes(c), java.nio.charset.StandardCharsets.UTF_8)
        meta += key -> readBytes(c)
        k += 1
      }
      n = readVarLong(c)
    }
    val schemaJson = meta.getOrElse("avro.schema",
      throw new IllegalArgumentException("avro: no avro.schema in metadata"))
    val schema = parseSchema(new String(schemaJson, java.nio.charset.StandardCharsets.UTF_8))
    val codec = meta.get("avro.codec")
      .map(new String(_, java.nio.charset.StandardCharsets.UTF_8)).getOrElse("null")
    require(codec == "null" || codec == "deflate", s"avro: codec '$codec' out of subset")
    require(c.at + 16 <= bytes.length, "avro: truncated sync marker")
    val sync = java.util.Arrays.copyOfRange(bytes, c.at, c.at + 16)
    c.at += 16
    val records = Vector.newBuilder[Array[Any]]
    var nBlocks = 0
    while (c.at < bytes.length) {
      val cnt = readVarLong(c)
      require(cnt > 0 && cnt < (1L << 30), s"avro: implausible block count $cnt")
      val payload0 = readBytes(c)
      val payload = if (codec == "deflate") inflateRaw(payload0) else payload0
      val pc = new Cursor(payload)
      var k = 0L
      while (k < cnt) {
        val row = new Array[Any](schema.fields.length)
        var f = 0
        while (f < schema.fields.length) {
          val fld = schema.fields(f)
          row(f) =
            if (fld.nullable) {
              val idx = readVarLong(pc)
              require(idx == 0 || idx == 1, s"avro: bad union index $idx")
              if (idx == 0) null else readValue(pc, fld.tpe)
            } else readValue(pc, fld.tpe)
          f += 1
        }
        records += row
        k += 1
      }
      require(pc.at == payload.length, "avro: block payload has trailing bytes")
      require(c.at + 16 <= bytes.length, "avro: truncated block sync")
      val blockSync = java.util.Arrays.copyOfRange(bytes, c.at, c.at + 16)
      require(java.util.Arrays.equals(blockSync, sync), "avro: sync marker mismatch")
      c.at += 16
      nBlocks += 1
    }
    Container(schema, codec, nBlocks, records.result())
  }

  // ---------------------------------------------------------------
  // write
  // ---------------------------------------------------------------

  private def inflateRaw(data: Array[Byte]): Array[Byte] = {
    val inf = new java.util.zip.Inflater(true) // RAW deflate per spec
    inf.setInput(data)
    val out = new ByteArrayOutputStream(math.max(64, data.length * 3))
    val buf = new Array[Byte](8192)
    try {
      while (!inf.finished()) {
        val n = inf.inflate(buf)
        if (n == 0 && inf.needsInput()) throw new IllegalArgumentException("avro: truncated deflate")
        out.write(buf, 0, n)
        require(out.size() <= (1 << 26), "avro: deflate payload balloons past 64 MiB")
      }
    } catch {
      case e: java.util.zip.DataFormatException =>
        throw new IllegalArgumentException(s"avro: bad deflate stream: ${e.getMessage}")
    } finally inf.end()
    out.toByteArray
  }

  private def deflateRaw(data: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater(java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
    d.setInput(data); d.finish()
    val out = new ByteArrayOutputStream(math.max(64, data.length / 2))
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  private def writeValue(out: ByteArrayOutputStream, t: AType, v: Any): Unit = t match {
    case ABool => out.write(if (v.asInstanceOf[Boolean]) 1 else 0)
    case AInt => writeVarLong(out, v.asInstanceOf[Int].toLong)
    case ALong => writeVarLong(out, v.asInstanceOf[Long])
    case AFloat =>
      val bits = java.lang.Float.floatToIntBits(v.asInstanceOf[Float])
      var k = 0
      while (k < 4) { out.write((bits >> (8 * k)) & 0xff); k += 1 }
    case ADouble =>
      val bits = java.lang.Double.doubleToLongBits(v.asInstanceOf[Double])
      var k = 0
      while (k < 8) { out.write(((bits >> (8 * k)) & 0xff).toInt); k += 1 }
    case AString =>
      val b = v.asInstanceOf[String].getBytes(java.nio.charset.StandardCharsets.UTF_8)
      writeVarLong(out, b.length.toLong); out.write(b, 0, b.length)
    case ABytes =>
      val b = v.asInstanceOf[Array[Byte]]
      writeVarLong(out, b.length.toLong); out.write(b, 0, b.length)
  }

  private def schemaJson(s: Schema): String = {
    val fs = s.fields.map { f =>
      val t = if (f.nullable) s"""["null","${f.tpe.name}"]""" else s""""${f.tpe.name}""""
      s"""{"name":"${f.name}","type":$t}"""
    }.mkString(",")
    s"""{"type":"record","name":"${s.name}","fields":[$fs]}"""
  }

  /** Serialize rows (field values in schema order, null = absent union
    * value) with `recordsPerBlock` records per data block. The sync
    * marker derives deterministically from `seed`.
    */
  def write(schema: Schema, rows: Seq[Array[Any]], codec: String,
            recordsPerBlock: Int, seed: Long): Array[Byte] = {
    require(codec == "null" || codec == "deflate", s"avro: codec '$codec' out of subset")
    require(recordsPerBlock >= 1, "avro: recordsPerBlock must be positive")
    val out = new ByteArrayOutputStream()
    out.write('O'); out.write('b'); out.write('j'); out.write(1)
    val meta: Seq[(String, Array[Byte])] = Seq(
      "avro.schema" -> schemaJson(schema).getBytes(java.nio.charset.StandardCharsets.UTF_8),
      "avro.codec" -> codec.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    writeVarLong(out, meta.length.toLong)
    meta.foreach { case (k, v) =>
      val kb = k.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      writeVarLong(out, kb.length.toLong); out.write(kb, 0, kb.length)
      writeVarLong(out, v.length.toLong); out.write(v, 0, v.length)
    }
    writeVarLong(out, 0L)
    val sync = new Array[Byte](16)
    var x = seed * 0x9E3779B97F4A7C15L + 0xD1B54A32D192ED03L
    var k = 0
    while (k < 16) { x ^= x << 13; x ^= x >>> 7; x ^= x << 17; sync(k) = (x & 0xff).toByte; k += 1 }
    out.write(sync, 0, 16)
    rows.grouped(recordsPerBlock).foreach { block =>
      val payload = new ByteArrayOutputStream()
      block.foreach { row =>
        require(row.length == schema.fields.length, "avro: row arity mismatch")
        var f = 0
        while (f < schema.fields.length) {
          val fld = schema.fields(f)
          val v = row(f)
          if (fld.nullable) {
            if (v == null) writeVarLong(payload, 0L)
            else { writeVarLong(payload, 1L); writeValue(payload, fld.tpe, v) }
          } else {
            require(v != null, s"avro: null in non-nullable field ${fld.name}")
            writeValue(payload, fld.tpe, v)
          }
          f += 1
        }
      }
      val enc = if (codec == "deflate") deflateRaw(payload.toByteArray) else payload.toByteArray
      writeVarLong(out, block.length.toLong)
      writeVarLong(out, enc.length.toLong)
      out.write(enc, 0, enc.length)
      out.write(sync, 0, 16)
    }
    out.toByteArray
  }

  // ---------------------------------------------------------------
  // deterministic fixture
  // ---------------------------------------------------------------

  /** The gate fixture schema: one nullable string among primitives,
    * bytes, boolean, exact-in-binary doubles.
    */
  val FixtureSchema: Schema = Schema("doc", Vector(
    Field("id", ALong, nullable = false),
    Field("name", AString, nullable = true),
    Field("score", ADouble, nullable = false),
    Field("flag", ABool, nullable = false),
    Field("payload", ABytes, nullable = false)))

  /** Deterministic container: `n` records, 2 per block (multi-block
    * from n ≥ 3), deflate codec on odd seeds. Every value is a
    * closed-form function of (seed, i): id = seed*10 + i; name null
    * when i % 3 == 0 else "n" + (seed + i); score = seed + i * 0.25
    * (exact in binary); flag = i even; payload = 3 bytes
    * [i, seed % 251, 7].
    */
  def synthAvro(seed: Long, n: Int): Array[Byte] = {
    require(n >= 1 && n <= 10000, s"synthAvro: bad n $n")
    val rows = (0 until n).map { i =>
      Array[Any](
        seed * 10 + i,
        if (i % 3 == 0) null else "n" + (seed + i),
        seed.toDouble + i * 0.25,
        i % 2 == 0,
        Array[Byte](i.toByte, (((seed % 251) + 251) % 251).toByte, 7))
    }
    write(FixtureSchema, rows, if (seed % 2 != 0) "deflate" else "null", 2, seed)
  }
}
