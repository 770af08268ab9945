package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** Avro object-container codec: write/read round trips across both
  * codecs and every subset type, schema-JSON parsing (escapes,
  * unions, subset rejections), block/sync structure, and
  * hostile-input guards (typed throws, never a crash or a zip-bomb
  * balloon).
  */
class AvroCodecSpec extends AnyFunSuite {
  import AvroCodec._

  private val schema = Schema("t", Vector(
    Field("b", ABool, nullable = false),
    Field("i", AInt, nullable = false),
    Field("l", ALong, nullable = false),
    Field("f", AFloat, nullable = false),
    Field("d", ADouble, nullable = false),
    Field("s", AString, nullable = true),
    Field("y", ABytes, nullable = false)))

  private def row(i: Int): Array[Any] = Array[Any](
    i % 2 == 0, i - 5, i.toLong * 1000000007L, i * 0.5f, i * 0.25,
    if (i % 3 == 0) null else s"str-é-$i", Array[Byte](i.toByte, -1, 0))

  test("round trip: every subset type, both codecs, multi-block") {
    for (codec <- Seq("null", "deflate")) {
      val rows = (0 until 7).map(row)
      val bytes = write(schema, rows, codec, recordsPerBlock = 3, seed = 42L)
      assert(isAvro(bytes))
      val c = read(bytes)
      assert(c.schema === schema)
      assert(c.codec === codec)
      assert(c.nBlocks === 3) // 3+3+1
      assert(c.records.length === 7)
      for (i <- 0 until 7; f <- 0 until 7) {
        (c.records(i)(f), rows(i)(f)) match {
          case (a: Array[Byte], b: Array[Byte]) => assert(a.toSeq === b.toSeq)
          case (a, b) => assert(a === b, s"row $i field $f")
        }
      }
    }
  }

  test("zigzag varints: negative and boundary longs survive") {
    val s = Schema("z", Vector(Field("v", ALong, nullable = false)))
    val vals = Seq(0L, -1L, 1L, 63L, -64L, 64L, Long.MaxValue, Long.MinValue, -1234567890123L)
    val c = read(write(s, vals.map(v => Array[Any](v)), "null", 100, 1L))
    assert(c.records.map(_(0)) === vals.toVector)
  }

  test("schema JSON parser: escapes, unions, rejections") {
    val sc = parseSchema(
      """{"type":"record","name":"r","fields":[
        |  {"name":"a","type":"long"},
        |  {"name":"u\n2","type":["null","string"]}]}""".stripMargin)
    assert(sc === Schema("r", Vector(
      Field("a", ALong, nullable = false), Field("u\n2", AString, nullable = true))))
    intercept[IllegalArgumentException](parseSchema("""{"type":"enum","name":"e"}"""))
    intercept[IllegalArgumentException](parseSchema(
      """{"type":"record","name":"r","fields":[{"name":"x","type":"map"}]}"""))
    intercept[IllegalArgumentException](parseSchema(
      """{"type":"record","name":"r","fields":[{"name":"x","type":["string","null"]}]}"""))
    intercept[IllegalArgumentException](parseSchema("{"))
  }

  test("sync marker mismatch and truncations throw typed messages") {
    val good = synthAvro(5L, 4)
    // corrupt the first data-block sync (the last 16 bytes of block 1
    // region): flip a byte near the end
    val bad = good.clone()
    bad(bad.length - 1) = (bad(bad.length - 1) ^ 0x55).toByte
    val e = intercept[IllegalArgumentException](read(bad))
    assert(e.getMessage != null)
    for (n <- 0 until good.length by 3) {
      val cut = java.util.Arrays.copyOf(good, n)
      try { read(cut); () }
      catch { case ex: Exception => assert(ex.getMessage != null) }
    }
    val rnd = new java.util.Random(3)
    for (_ <- 0 until 300) {
      val mut = good.clone()
      mut(rnd.nextInt(mut.length)) = rnd.nextInt(256).toByte
      try { read(mut); () }
      catch { case ex: Exception => assert(ex.getMessage != null) }
    }
  }

  test("synthAvro fixture matches its documented closed form") {
    val seed = 9L
    val c = read(synthAvro(seed, 5))
    assert(c.codec === "deflate") // odd seed
    assert(c.nBlocks === 3)
    for (i <- 0 until 5) {
      val r = c.records(i)
      assert(r(0) === seed * 10 + i)
      assert(r(1) === (if (i % 3 == 0) null else "n" + (seed + i)))
      assert(r(2) === seed.toDouble + i * 0.25)
      assert(r(3) === (i % 2 == 0))
      assert(r(4).asInstanceOf[Array[Byte]].toSeq === Seq(i.toByte, (seed % 251).toByte, 7.toByte))
    }
    assert(read(synthAvro(8L, 2)).codec === "null")
    assert(FormatDetect.detect(synthAvro(8L, 2)) === "avro")
  }

  test("expression layer null-guards corrupt payloads") {
    assert(graft.functions.AvroExprs.avroMetaRow("Obj not avro".getBytes) === null)
    assert(graft.functions.AvroExprs.avroRecords(Array[Byte](1)) === null)
    // other-schema container → records view refuses, meta still parses
    val other = write(schema, Seq(row(1)), "null", 1, 7L)
    assert(graft.functions.AvroExprs.avroRecords(other) === null)
    assert(graft.functions.AvroExprs.avroMetaRow(other) !== null)
  }
}
