package graft.functions

import graft.sources.ImageCodec
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Catalyst expressions for the real image codec (B4/B5/B6) — thin
  * codegen'd wrappers over [[graft.sources.ImageCodec]] static calls,
  * so scan-effects / re-encode / decode-dims ride INSIDE whole-stage
  * codegen like any other projection (no UDF boundary, no row-at-a-time
  * serialization). Each evaluates to null when the payload is not a
  * decodable image: the query layer coalesces those onto the documented
  * PDF-stub path.
  */
object ImageExprs {
  /** Static decode-dims helper returning the struct row codegen needs. */
  def infoRow(bytes: Array[Byte]): InternalRow = {
    val info = ImageCodec.imageInfo(bytes)
    if (info == null) null
    else new GenericInternalRow(Array[Any](
      info(0).asInstanceOf[Integer].intValue(),
      info(1).asInstanceOf[Integer].intValue(),
      UTF8String.fromString(info(2).asInstanceOf[String])))
  }

  val InfoSchema: StructType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("format", StringType, nullable = true)))

  /** Static resize helper for codegen: decode → bilinear → PNG. */
  def resizePng(bytes: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val px = ImageCodec.decode(bytes)
    if (px == null) null else ImageCodec.encodePng(ImageCodec.resize(px, w, h))
  }

  /** Sum of all RGB channel values of a decodable image, -1 when not
    * an image (the expression maps -1 to null). An exact, order-free
    * pixel digest the SQL oracle can recompute in closed form for
    * synthetic fixtures — the gate primitive for raster outputs.
    */
  def pixelSum(bytes: Array[Byte]): Long = {
    val px = ImageCodec.decode(bytes)
    if (px == null) return -1L
    var s = 0L
    var i = 0
    while (i < px.rgb.length) {
      val v = px.rgb(i)
      s += ((v >> 16) & 0xff) + ((v >> 8) & 0xff) + (v & 0xff)
      i += 1
    }
    s
  }
}

/** Exact pixel-sum digest of an image payload (long); null for
  * non-images — see [[ImageExprs.pixelSum]].
  */
case class ImagePixelSumExpr(child: Expression) extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(BinaryType)
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def nullSafeEval(b: Any): Any = {
    val s = ImageExprs.pixelSum(b.asInstanceOf[Array[Byte]])
    if (s < 0) null else s
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => {
      val r = ctx.freshName("pxSum")
      s"""
         |long $r = graft.functions.ImageExprs.pixelSum($b);
         |if ($r < 0) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
       """.stripMargin
    })
  override protected def withNewChildInternal(c: Expression): ImagePixelSumExpr = copy(child = c)
  override def prettyName: String = "image_pixel_sum"
}

/** `add_scan_effects_minimal` (`fixed_signature_utils.py:369-450`) as a
  * deterministic binary→binary expression; null for non-image payloads.
  */
case class ScanMinimalExpr(child: Expression, quality: String) extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(BinaryType)
  require(quality.matches("[a-z_]+"), s"bad quality preset: $quality")
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def nullSafeEval(b: Any): Any =
    ImageCodec.scanEffectsMinimal(b.asInstanceOf[Array[Byte]], quality)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => {
      val r = ctx.freshName("scanned")
      s"""
         |byte[] $r = graft.sources.ImageCodec.scanEffectsMinimal($b, "$quality");
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
       """.stripMargin
    })
  override protected def withNewChildInternal(c: Expression): ScanMinimalExpr = copy(child = c)
  override def prettyName: String = "scan_effects_minimal"
}

/** Seeded `add_scan_effects` (`fixed_signature_utils.py:453-558`):
  * (content, seed) → JPEG bytes, a pure function of its inputs
  * (SURVEY §2.10's explicit-seed contract). Null for non-images.
  */
case class ScanSeededExpr(left: Expression, right: Expression, quality: String)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(BinaryType, LongType)
  require(quality.matches("[a-z_]+"), s"bad quality preset: $quality")
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def nullSafeEval(b: Any, seed: Any): Any =
    ImageCodec.scanEffects(b.asInstanceOf[Array[Byte]], quality, seed.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (b, seed) => {
      val r = ctx.freshName("scanned")
      s"""
         |byte[] $r = graft.sources.ImageCodec.scanEffects($b, "$quality", $seed);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
       """.stripMargin
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression): ScanSeededExpr =
    copy(left = l, right = r)
  override def prettyName: String = "scan_effects_seeded"
}

/** Per-frame JPEG re-encode (`app.py:268-271`). Null for non-images. */
case class JpegReencodeExpr(child: Expression, quality: Int) extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(BinaryType)
  require(quality >= 1 && quality <= 100, s"jpeg quality out of range: $quality")
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def nullSafeEval(b: Any): Any =
    ImageCodec.jpegReencode(b.asInstanceOf[Array[Byte]], quality)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => {
      val r = ctx.freshName("jpg")
      s"""
         |byte[] $r = graft.sources.ImageCodec.jpegReencode($b, $quality);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
       """.stripMargin
    })
  override protected def withNewChildInternal(c: Expression): JpegReencodeExpr = copy(child = c)
  override def prettyName: String = "jpeg_reencode"
}

/** B1 `compress_pdf_bytes` image path (`fixed_signature_utils
  * .py:38-110`): dpi-preset resize + sharpen + contrast + JPEG, on
  * real pixels. Null for non-images.
  */
case class CompressImageExpr(child: Expression, quality: String) extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(BinaryType)
  require(quality.matches("[a-z_]+"), s"bad quality preset: $quality")
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def nullSafeEval(b: Any): Any =
    ImageCodec.compressImage(b.asInstanceOf[Array[Byte]], quality)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => {
      val r = ctx.freshName("compressed")
      s"""
         |byte[] $r = graft.sources.ImageCodec.compressImage($b, "$quality");
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
       """.stripMargin
    })
  override protected def withNewChildInternal(c: Expression): CompressImageExpr = copy(child = c)
  override def prettyName: String = "compress_image"
}

/** Real bilinear resize of an image payload to (w, h), re-encoded as
  * PNG (lossless — resize is a geometry op, not a compression op).
  * Null for non-images.
  */
case class ResizeImageExpr(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(BinaryType, IntegerType, IntegerType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def nullSafeEval(b: Any, w: Any, h: Any): Any =
    ImageExprs.resizePng(b.asInstanceOf[Array[Byte]], w.asInstanceOf[Int], h.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (b, w, h) => {
      val r = ctx.freshName("resized")
      s"""
         |byte[] $r = graft.functions.ImageExprs.resizePng($b, $w, $h);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
       """.stripMargin
    })
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): ResizeImageExpr =
    copy(first = f, second = s, third = t)
  override def prettyName: String = "resize_image"
}

/** Real decode of an image payload to struct(width, height, format);
  * null when undecodable.
  */
case class ImageInfoExpr(child: Expression) extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(BinaryType)
  override def dataType: DataType = ImageExprs.InfoSchema
  override def nullable: Boolean = true
  override def nullSafeEval(b: Any): Any = ImageExprs.infoRow(b.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => {
      val r = ctx.freshName("info")
      s"""
         |InternalRow $r = graft.functions.ImageExprs.infoRow($b);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
       """.stripMargin
    })
  override protected def withNewChildInternal(c: Expression): ImageInfoExpr = copy(child = c)
  override def prettyName: String = "image_info"
}

/** Deterministic synthetic PNG fixture: (seed, w, h) → PNG bytes.
  * Gives oracle queries an image input whose dimensions are a SQL-
  * computable function of the row, so DuckDB can independently verify
  * the decode→effects→encode→decode round trip.
  */
case class SynthImageExpr(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(LongType, IntegerType, IntegerType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def nullSafeEval(seed: Any, w: Any, h: Any): Any =
    ImageCodec.synthPng(seed.asInstanceOf[Long], w.asInstanceOf[Int], h.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, w, h) =>
      s"${ev.value} = graft.sources.ImageCodec.synthPng($s, $w, $h);")
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): SynthImageExpr =
    copy(first = f, second = s, third = t)
  override def prettyName: String = "synth_image"
}

/** Column-level entry points. */
object ImageOps {
  def scanMinimal(bin: Column, quality: String): Column =
    GraftExpr.toColumn(ScanMinimalExpr(GraftExpr.toExpr(bin), quality))
  def scanSeeded(bin: Column, seed: Column, quality: String): Column =
    GraftExpr.toColumn(ScanSeededExpr(GraftExpr.toExpr(bin), GraftExpr.toExpr(seed), quality))
  def jpegReencode(bin: Column, quality: Int): Column =
    GraftExpr.toColumn(JpegReencodeExpr(GraftExpr.toExpr(bin), quality))
  def compressImage(bin: Column, quality: String): Column =
    GraftExpr.toColumn(CompressImageExpr(GraftExpr.toExpr(bin), quality))
  def resizeImage(bin: Column, w: Column, h: Column): Column =
    GraftExpr.toColumn(ResizeImageExpr(
      GraftExpr.toExpr(bin), GraftExpr.toExpr(w), GraftExpr.toExpr(h)))
  def imageInfo(bin: Column): Column =
    GraftExpr.toColumn(ImageInfoExpr(GraftExpr.toExpr(bin)))
  def imagePixelSum(bin: Column): Column =
    GraftExpr.toColumn(ImagePixelSumExpr(GraftExpr.toExpr(bin)))
  def synthImage(seed: Column, w: Column, h: Column): Column =
    GraftExpr.toColumn(SynthImageExpr(
      GraftExpr.toExpr(seed), GraftExpr.toExpr(w), GraftExpr.toExpr(h)))
}
