package graft.functions

import graft.sources.{ImageCodec, TiffCodec}
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, ImplicitCastInputTypes, QuaternaryExpression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.types._

/** Catalyst expressions over [[graft.sources.TiffCodec]] — TIFF
  * container parse / decode as codegen'd projections, mirroring
  * [[PdfExprs]]. Null-in → null-out; a non-TIFF payload evaluates to
  * null rather than throwing (poison-guard), so mixed-format corpus
  * queries can quarantine instead of dying. The reference reads TIFF
  * uploads transparently through PyMuPDF (`app.py:241`); here the
  * container is a from-scratch IFD walk routed to the repo's own
  * strip decoders.
  */
object TiffExprs {

  val InfoSchema: StructType = StructType(Seq(
    "width", "height", "bits", "spp", "compression", "photometric",
    "n_strips", "rows_per_strip", "predictor", "n_ifds",
    "tile_width", "tile_length")
    .map(f => StructField(f, LongType, nullable = false)))

  /** Static parse-metadata helper boxed for codegen; null on any
    * parse failure. For tiled layouts `n_strips` counts TILES and
    * `rows_per_strip` is the tile length; `tile_width`/`tile_length`
    * are 0 on strip-organized documents.
    */
  def tiffInfoRow(bytes: Array[Byte]): InternalRow =
    try {
      val i = TiffCodec.tiffInfo(bytes)
      new GenericInternalRow(Array[Any](
        i.width.toLong, i.height.toLong, i.bits.toLong, i.spp.toLong,
        i.compression.toLong, i.photometric.toLong, i.nStrips.toLong,
        i.rowsPerStrip.toLong, i.predictor.toLong, i.nIfds.toLong,
        i.tileWidth.toLong, i.tileLength.toLong))
    } catch { case _: Exception => null }

  /** [[TiffCodec.jpegFixtureMaxErr]] boxed for codegen; 999 (not
    * null) on parse/decode failure so the gate column stays non-null
    * and a broken fixture FAILS the `<= bound` compare instead of
    * disappearing.
    */
  def tiffJpegErr(bytes: Array[Byte], mode: Int, seed: Long): Long =
    try TiffCodec.jpegFixtureMaxErr(bytes, mode, seed)
    catch { case _: Exception => 999L }

  /** Decode the first IFD to PNG bytes (so the downstream raster
    * operators — pixel sum, resize, effects — compose unchanged);
    * null on any parse/decode failure.
    */
  def tiffToPng(bytes: Array[Byte]): Array[Byte] =
    try ImageCodec.encodePng(TiffCodec.decode(bytes))
    catch { case _: Exception => null }

  /** Per-PAGE R+G+B pixel sums of a multi-page document (same fold as
    * [[ImageExprs.pixelSum]], one element per chained IFD); null on
    * any parse/decode failure — one bad page poisons the document,
    * the whole-doc contract every codec entry point keeps.
    */
  def tiffPageSums(bytes: Array[Byte]): org.apache.spark.sql.catalyst.util.ArrayData =
    try {
      val sums = TiffCodec.decodeAll(bytes).map { px =>
        var s = 0L
        var i = 0
        while (i < px.rgb.length) {
          val v = px.rgb(i)
          s += ((v >> 16) & 0xff) + ((v >> 8) & 0xff) + (v & 0xff)
          i += 1
        }
        s: Any
      }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(sums.toArray)
    } catch { case _: Exception => null }
}

/** Parse metadata of a TIFF payload: struct(width, height, bits, spp,
  * compression, photometric, n_strips, rows_per_strip, predictor,
  * n_ifds); null for non-TIFF or malformed bytes.
  */
case class TiffInfoExpr(child: Expression) extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(BinaryType)
  override def dataType: DataType = TiffExprs.InfoSchema
  override def nullable: Boolean = true
  override def nullSafeEval(b: Any): Any = TiffExprs.tiffInfoRow(b.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => {
      val r = ctx.freshName("tiffInfo")
      s"""
         |InternalRow $r = graft.functions.TiffExprs.tiffInfoRow($b);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
       """.stripMargin
    })
  override protected def withNewChildInternal(c: Expression): TiffInfoExpr = copy(child = c)
  override def prettyName: String = "tiff_info"
}

/** Decode the first IFD of a TIFF payload to PNG bytes; null for
  * non-TIFF, out-of-subset, or corrupt strips.
  */
case class TiffDecodeExpr(child: Expression) extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(BinaryType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def nullSafeEval(b: Any): Any = TiffExprs.tiffToPng(b.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => {
      val r = ctx.freshName("tiffPng")
      s"""
         |byte[] $r = graft.functions.TiffExprs.tiffToPng($b);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
       """.stripMargin
    })
  override protected def withNewChildInternal(c: Expression): TiffDecodeExpr = copy(child = c)
  override def prettyName: String = "tiff_decode"
}

/** Deterministic gray-8 multi-strip TIFF fixture
  * ([[TiffCodec.synthTiff]]): (seed, w, h, variant) → TIFF bytes whose
  * decoded pixel sum is closed-form; `variant % 4` cycles
  * none/LZW+predictor/PackBits/Deflate+predictor, seed parity cycles
  * byte order.
  */
case class SynthTiffExpr(first: Expression, second: Expression,
                         third: Expression, fourth: Expression)
    extends QuaternaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(LongType, IntegerType, IntegerType, IntegerType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def nullSafeEval(seed: Any, w: Any, h: Any, v: Any): Any =
    TiffCodec.synthTiff(seed.asInstanceOf[Long], w.asInstanceOf[Int],
      h.asInstanceOf[Int], v.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (seed, w, h, v) =>
      s"${ev.value} = graft.sources.TiffCodec.synthTiff($seed, $w, $h, $v);")
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression, q: Expression): SynthTiffExpr =
    copy(first = f, second = s, third = t, fourth = q)
  override def prettyName: String = "synth_tiff"
}

/** Deterministic bilevel CCITT G4 multi-strip TIFF fixture
  * ([[TiffCodec.synthTiffG4]]): (seed, w, h) → TIFF bytes (photometric
  * 0, the fax polarity) whose decoded pixel sum is closed-form.
  */
case class SynthTiffG4Expr(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(LongType, IntegerType, IntegerType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def nullSafeEval(seed: Any, w: Any, h: Any): Any =
    TiffCodec.synthTiffG4(seed.asInstanceOf[Long], w.asInstanceOf[Int], h.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (seed, w, h) =>
      s"${ev.value} = graft.sources.TiffCodec.synthTiffG4($seed, $w, $h);")
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): SynthTiffG4Expr =
    copy(first = f, second = s, third = t)
  override def prettyName: String = "synth_tiff_g4"
}

/** Deterministic MULTI-PAGE gray-8 TIFF fixture
  * ([[TiffCodec.composeMultiTiff]]): (seed, w, h, nPages) → chained
  * IFDs, page k drawing grayAt(seed+k) pixels under compression
  * variant (seed+k) % 4 — one document mixing all four strip codecs.
  */
case class SynthTiffMultiExpr(first: Expression, second: Expression,
                              third: Expression, fourth: Expression)
    extends QuaternaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(LongType, IntegerType, IntegerType, IntegerType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def nullSafeEval(seed: Any, w: Any, h: Any, n: Any): Any =
    TiffCodec.composeMultiTiff(seed.asInstanceOf[Long], w.asInstanceOf[Int],
      h.asInstanceOf[Int], n.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (seed, w, h, n) =>
      s"${ev.value} = graft.sources.TiffCodec.composeMultiTiff($seed, $w, $h, $n);")
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression, q: Expression): SynthTiffMultiExpr =
    copy(first = f, second = s, third = t, fourth = q)
  override def prettyName: String = "synth_tiff_multi"
}

/** Deterministic TILED gray-8 TIFF fixture
  * ([[TiffCodec.synthTiffTiled]]): 16×16 tiles, same pixel formula and
  * compression cycle as `synth_tiff`, so one closed form gates both
  * layouts.
  */
case class SynthTiffTiledExpr(first: Expression, second: Expression,
                              third: Expression, fourth: Expression)
    extends QuaternaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(LongType, IntegerType, IntegerType, IntegerType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def nullSafeEval(seed: Any, w: Any, h: Any, v: Any): Any =
    TiffCodec.synthTiffTiled(seed.asInstanceOf[Long], w.asInstanceOf[Int],
      h.asInstanceOf[Int], v.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (seed, w, h, v) =>
      s"${ev.value} = graft.sources.TiffCodec.synthTiffTiled($seed, $w, $h, $v);")
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression, q: Expression): SynthTiffTiledExpr =
    copy(first = f, second = s, third = t, fourth = q)
  override def prettyName: String = "synth_tiff_tiled"
}

/** JPEG-in-TIFF fixture ([[TiffCodec.synthTiffJpeg]]): mode 0 =
  * new-style strips, 1 = strips + shared JPEGTables, 2 = 16×16 tiles,
  * 3 = old-style JPEGInterchangeFormat.
  */
case class SynthTiffJpegExpr(first: Expression, second: Expression,
                             third: Expression, fourth: Expression)
    extends QuaternaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(LongType, IntegerType, IntegerType, IntegerType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def nullSafeEval(seed: Any, w: Any, h: Any, m: Any): Any =
    TiffCodec.synthTiffJpeg(seed.asInstanceOf[Long], w.asInstanceOf[Int],
      h.asInstanceOf[Int], m.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (seed, w, h, m) =>
      s"${ev.value} = graft.sources.TiffCodec.synthTiffJpeg($seed, $w, $h, $m);")
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression, q: Expression): SynthTiffJpegExpr =
    copy(first = f, second = s, third = t, fourth = q)
  override def prettyName: String = "synth_tiff_jpeg"
}

/** Max per-channel deviation of a decoded [[TiffCodec.synthTiffJpeg]]
  * fixture from its closed-form flat pattern ([[TiffExprs.tiffJpegErr]];
  * 999 on failure — the gate compares `<= bound`).
  */
case class TiffJpegErrExpr(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(BinaryType, IntegerType, LongType)
  override def dataType: DataType = LongType
  override def nullable: Boolean = first.nullable || second.nullable || third.nullable
  override def nullSafeEval(b: Any, m: Any, seed: Any): Any =
    TiffExprs.tiffJpegErr(b.asInstanceOf[Array[Byte]], m.asInstanceOf[Int],
      seed.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (b, m, seed) =>
      s"${ev.value} = graft.functions.TiffExprs.tiffJpegErr($b, $m, $seed);")
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): TiffJpegErrExpr =
    copy(first = f, second = s, third = t)
  override def prettyName: String = "tiff_jpeg_err"
}

/** Deterministic PALETTE TIFF fixture
  * ([[TiffCodec.synthTiffPalette]]): photometric 3 with a 768-entry
  * ColorMap whose channels are closed-form in the index.
  */
case class SynthTiffPaletteExpr(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(LongType, IntegerType, IntegerType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def nullSafeEval(seed: Any, w: Any, h: Any): Any =
    TiffCodec.synthTiffPalette(seed.asInstanceOf[Long], w.asInstanceOf[Int], h.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (seed, w, h) =>
      s"${ev.value} = graft.sources.TiffCodec.synthTiffPalette($seed, $w, $h);")
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): SynthTiffPaletteExpr =
    copy(first = f, second = s, third = t)
  override def prettyName: String = "synth_tiff_palette"
}

/** Per-page pixel sums of a (possibly multi-page) TIFF
  * ([[TiffExprs.tiffPageSums]]): array of one R+G+B sum per chained
  * IFD; null for unparseable or partially-undecodable documents.
  */
case class TiffPageSumsExpr(child: Expression) extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(BinaryType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def nullSafeEval(b: Any): Any =
    TiffExprs.tiffPageSums(b.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val r = ctx.freshName("tiffSums")
    nullSafeCodeGen(ctx, ev, b =>
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $r =
         |  graft.functions.TiffExprs.tiffPageSums($b);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
       """.stripMargin)
  }
  override protected def withNewChildInternal(c: Expression): TiffPageSumsExpr = copy(child = c)
  override def prettyName: String = "tiff_page_sums"
}

/** Column-API wrappers (see [[PdfOps]] for the convention). */
object TiffOps {
  def tiffInfo(bin: Column): Column =
    GraftExpr.toColumn(TiffInfoExpr(GraftExpr.toExpr(bin)))
  def tiffDecode(bin: Column): Column =
    GraftExpr.toColumn(TiffDecodeExpr(GraftExpr.toExpr(bin)))
  def synthTiff(seed: Column, w: Column, h: Column, variant: Column): Column =
    GraftExpr.toColumn(SynthTiffExpr(GraftExpr.toExpr(seed), GraftExpr.toExpr(w),
      GraftExpr.toExpr(h), GraftExpr.toExpr(variant)))
  def synthTiffG4(seed: Column, w: Column, h: Column): Column =
    GraftExpr.toColumn(SynthTiffG4Expr(GraftExpr.toExpr(seed), GraftExpr.toExpr(w),
      GraftExpr.toExpr(h)))
  def synthTiffMulti(seed: Column, w: Column, h: Column, nPages: Column): Column =
    GraftExpr.toColumn(SynthTiffMultiExpr(GraftExpr.toExpr(seed), GraftExpr.toExpr(w),
      GraftExpr.toExpr(h), GraftExpr.toExpr(nPages)))
  def tiffPageSums(bin: Column): Column =
    GraftExpr.toColumn(TiffPageSumsExpr(GraftExpr.toExpr(bin)))
  def synthTiffTiled(seed: Column, w: Column, h: Column, variant: Column): Column =
    GraftExpr.toColumn(SynthTiffTiledExpr(GraftExpr.toExpr(seed), GraftExpr.toExpr(w),
      GraftExpr.toExpr(h), GraftExpr.toExpr(variant)))
  def synthTiffJpeg(seed: Column, w: Column, h: Column, mode: Column): Column =
    GraftExpr.toColumn(SynthTiffJpegExpr(GraftExpr.toExpr(seed), GraftExpr.toExpr(w),
      GraftExpr.toExpr(h), GraftExpr.toExpr(mode)))
  def tiffJpegErr(bin: Column, mode: Column, seed: Column): Column =
    GraftExpr.toColumn(TiffJpegErrExpr(GraftExpr.toExpr(bin), GraftExpr.toExpr(mode),
      GraftExpr.toExpr(seed)))
  def synthTiffPalette(seed: Column, w: Column, h: Column): Column =
    GraftExpr.toColumn(SynthTiffPaletteExpr(GraftExpr.toExpr(seed), GraftExpr.toExpr(w),
      GraftExpr.toExpr(h)))
}
