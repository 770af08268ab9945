package graft.functions

import graft.sources.AviCodec
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow, ImplicitCastInputTypes, QuaternaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Catalyst expressions over [[graft.sources.AviCodec]] — the RIFF-AVI
  * video container (DIB + Motion-JPEG) as codegen'd projections,
  * mirroring [[GifExprs]]. Null-in → null-out; non-AVI payloads
  * evaluate to null so query layers can coalesce onto documented
  * fallbacks.
  */
object AviExprs {

  val InfoSchema: StructType = StructType(Seq(
    StructField("n_frames", LongType, nullable = false),
    StructField("width", LongType, nullable = false),
    StructField("height", LongType, nullable = false),
    StructField("fps", LongType, nullable = false)))

  def aviInfoRow(bytes: Array[Byte]): InternalRow = {
    val info = AviCodec.aviInfo(bytes)
    if (info == null) null
    else new GenericInternalRow(Array[Any](info(0), info(1), info(2), info(3)))
  }

  def frameLumaArray(bytes: Array[Byte]): ArrayData = {
    val a = AviCodec.frameLumas(bytes)
    if (a == null) null else new GenericArrayData(a)
  }

  /** Boxed fused analysis row for codegen: ONE decode → both arrays
    * (same shape as [[GifExprs.AnalyzeSchema]]).
    */
  def analyzeRow(bytes: Array[Byte]): InternalRow = {
    val r = AviCodec.analyze(bytes)
    if (r == null) null
    else new GenericInternalRow(Array[Any](new GenericArrayData(r._1),
      if (r._2 == null) null else new GenericArrayData(r._2)))
  }

  def toMjpegBytes(bytes: Array[Byte], quality: Int): Array[Byte] =
    AviCodec.toMjpeg(bytes, fps = 10, quality = quality)
}

/** Parse metadata of an AVI payload: struct(n_frames, width, height,
  * fps); null for non-AVI bytes.
  */
case class AviInfoExpr(child: Expression) extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(BinaryType)
  override def dataType: DataType = AviExprs.InfoSchema
  override def nullable: Boolean = true
  override def nullSafeEval(b: Any): Any = AviExprs.aviInfoRow(b.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => {
      val r = ctx.freshName("aviInfo")
      s"""
         |InternalRow $r = graft.functions.AviExprs.aviInfoRow($b);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
       """.stripMargin
    })
  override protected def withNewChildInternal(c: Expression): AviInfoExpr = copy(child = c)
  override def prettyName: String = "avi_info"
}

/** Per-frame mean luminance of an AVI's frame sequence (one container
  * decode): array<bigint> in stream order; null for non-AVI bytes.
  */
case class AviFrameLumasExpr(child: Expression) extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(BinaryType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def nullSafeEval(b: Any): Any =
    AviExprs.frameLumaArray(b.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => {
      val r = ctx.freshName("aviLumas")
      s"""
         |ArrayData $r = graft.functions.AviExprs.frameLumaArray($b);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
       """.stripMargin
    })
  override protected def withNewChildInternal(c: Expression): AviFrameLumasExpr = copy(child = c)
  override def prettyName: String = "avi_frame_lumas"
}

/** Fused per-sequence analysis: struct(lumas, motion) from ONE
  * container decode — the AVI twin of [[GifAnalyzeExpr]].
  */
case class AviAnalyzeExpr(child: Expression) extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(BinaryType)
  override def dataType: DataType = GifExprs.AnalyzeSchema
  override def nullable: Boolean = true
  override def nullSafeEval(b: Any): Any =
    AviExprs.analyzeRow(b.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => {
      val r = ctx.freshName("aviAn")
      s"""
         |InternalRow $r = graft.functions.AviExprs.analyzeRow($b);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
       """.stripMargin
    })
  override protected def withNewChildInternal(c: Expression): AviAnalyzeExpr = copy(child = c)
  override def prettyName: String = "avi_analyze"
}

/** Transcode an AVI to Motion-JPEG at `quality` (frame-wise JPEG
  * re-encode on a real container); null when the input doesn't decode.
  */
case class AviToMjpegExpr(left: Expression, right: Expression) extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(BinaryType, IntegerType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def nullSafeEval(b: Any, q: Any): Any = {
    val out = AviExprs.toMjpegBytes(b.asInstanceOf[Array[Byte]], q.asInstanceOf[Int])
    out // null-propagates on undecodable input
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (b, q) => {
      val r = ctx.freshName("mjpeg")
      s"""
         |byte[] $r = graft.functions.AviExprs.toMjpegBytes($b, $q);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
       """.stripMargin
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression): AviToMjpegExpr =
    copy(left = l, right = r)
  override def prettyName: String = "avi_to_mjpeg"
}

/** Deterministic AVI fixture: (seed, n_frames, w, h) → uncompressed
  * DIB AVI whose frame metadata AND per-frame pixels are closed-form
  * functions of the inputs — the oracle-gate entry point for the AVI
  * codec, twin of [[SynthGifExpr]].
  */
case class SynthAviExpr(first: Expression, second: Expression,
                        third: Expression, fourth: Expression)
    extends QuaternaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(LongType, IntegerType, IntegerType, IntegerType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def nullSafeEval(seed: Any, n: Any, w: Any, h: Any): Any =
    AviCodec.synthAvi(seed.asInstanceOf[Long], n.asInstanceOf[Int],
      w.asInstanceOf[Int], h.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (seed, n, w, h) =>
      s"${ev.value} = graft.sources.AviCodec.synthAvi($seed, $n, $w, $h);")
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression, q: Expression): SynthAviExpr =
    copy(first = f, second = s, third = t, fourth = q)
  override def prettyName: String = "synth_avi"
}

/** Column-level entry points. */
object AviOps {
  def aviInfo(bin: Column): Column =
    GraftExpr.toColumn(AviInfoExpr(GraftExpr.toExpr(bin)))
  def frameLumas(bin: Column): Column =
    GraftExpr.toColumn(AviFrameLumasExpr(GraftExpr.toExpr(bin)))
  def analyze(bin: Column): Column =
    GraftExpr.toColumn(AviAnalyzeExpr(GraftExpr.toExpr(bin)))
  def toMjpeg(bin: Column, quality: Column): Column =
    GraftExpr.toColumn(AviToMjpegExpr(GraftExpr.toExpr(bin), GraftExpr.toExpr(quality)))
  def synthAvi(seed: Column, nFrames: Column, w: Column, h: Column): Column =
    GraftExpr.toColumn(SynthAviExpr(GraftExpr.toExpr(seed), GraftExpr.toExpr(nFrames),
      GraftExpr.toExpr(w), GraftExpr.toExpr(h)))
}
