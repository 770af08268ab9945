package graft.functions

import graft.sources.GifCodec
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, ImplicitCastInputTypes, QuaternaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Catalyst expressions over [[graft.sources.GifCodec]] — the
  * moving-picture container operators (frame-count metadata,
  * per-frame luminance analysis, deterministic synth fixture) as
  * codegen'd projections, mirroring [[AudioExprs]]/[[ImageExprs]].
  * Null-in → null-out; non-GIF payloads evaluate to null so query
  * layers can coalesce onto documented fallbacks.
  */
object GifExprs {

  val InfoSchema: StructType = StructType(Seq(
    StructField("n_frames", LongType, nullable = false),
    StructField("width", LongType, nullable = false),
    StructField("height", LongType, nullable = false)))

  /** Static parse-metadata helper: struct row of [[GifCodec.gifInfo]]. */
  def gifInfoRow(bytes: Array[Byte]): InternalRow = {
    val info = GifCodec.gifInfo(bytes)
    if (info == null) null
    else new GenericInternalRow(Array[Any](info(0), info(1), info(2)))
  }

  /** Boxed per-frame mean-luma array for codegen. */
  def frameLumaArray(bytes: Array[Byte]): ArrayData = {
    val a = GifCodec.frameLumas(bytes)
    if (a == null) null else new GenericArrayData(a)
  }

  /** Boxed consecutive-frame motion array for codegen. */
  def frameMotionArray(bytes: Array[Byte]): ArrayData = {
    val a = GifCodec.frameMotion(bytes)
    if (a == null) null else new GenericArrayData(a)
  }

  val AnalyzeSchema: StructType = StructType(Seq(
    StructField("lumas", ArrayType(LongType, containsNull = false), nullable = false),
    StructField("motion", ArrayType(LongType, containsNull = false), nullable = true)))

  /** Boxed fused analysis row for codegen: ONE decode → both arrays. */
  def analyzeRow(bytes: Array[Byte]): InternalRow = {
    val r = GifCodec.analyze(bytes)
    if (r == null) null
    else new GenericInternalRow(Array[Any](new GenericArrayData(r._1),
      if (r._2 == null) null else new GenericArrayData(r._2)))
  }
}

/** Parse metadata of an animated-GIF payload: struct(n_frames, width,
  * height); null for non-GIF bytes.
  */
case class GifInfoExpr(child: Expression) extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(BinaryType)
  override def dataType: DataType = GifExprs.InfoSchema
  override def nullable: Boolean = true
  override def nullSafeEval(b: Any): Any = GifExprs.gifInfoRow(b.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => {
      val r = ctx.freshName("gifInfo")
      s"""
         |InternalRow $r = graft.functions.GifExprs.gifInfoRow($b);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
       """.stripMargin
    })
  override protected def withNewChildInternal(c: Expression): GifInfoExpr = copy(child = c)
  override def prettyName: String = "gif_info"
}

/** Per-frame mean luminance of a GIF's frame sequence (one container
  * decode): array<bigint> in stream order; null for non-GIF bytes.
  */
case class GifFrameLumasExpr(child: Expression) extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(BinaryType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def nullSafeEval(b: Any): Any =
    GifExprs.frameLumaArray(b.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => {
      val r = ctx.freshName("lumas")
      s"""
         |ArrayData $r = graft.functions.GifExprs.frameLumaArray($b);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
       """.stripMargin
    })
  override protected def withNewChildInternal(c: Expression): GifFrameLumasExpr = copy(child = c)
  override def prettyName: String = "gif_frame_lumas"
}

/** Consecutive-frame motion (mean |Δr|+|Δg|+|Δb| per pixel) of a
  * GIF's frame sequence: array<bigint> of length n_frames-1; null for
  * non-GIF or single-frame payloads.
  */
case class GifFrameMotionExpr(child: Expression) extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(BinaryType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def nullSafeEval(b: Any): Any =
    GifExprs.frameMotionArray(b.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => {
      val r = ctx.freshName("motion")
      s"""
         |ArrayData $r = graft.functions.GifExprs.frameMotionArray($b);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
       """.stripMargin
    })
  override protected def withNewChildInternal(c: Expression): GifFrameMotionExpr = copy(child = c)
  override def prettyName: String = "gif_frame_motion"
}

/** Fused per-sequence analysis: struct(lumas array<bigint>, motion
  * array<bigint>) from ONE container decode — the projection for
  * queries consuming both signals (keyframe sampling), where separate
  * luma/motion expressions would decode the container twice per row.
  */
case class GifAnalyzeExpr(child: Expression) extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(BinaryType)
  override def dataType: DataType = GifExprs.AnalyzeSchema
  override def nullable: Boolean = true
  override def nullSafeEval(b: Any): Any =
    GifExprs.analyzeRow(b.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => {
      val r = ctx.freshName("gifAn")
      s"""
         |InternalRow $r = graft.functions.GifExprs.analyzeRow($b);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
       """.stripMargin
    })
  override protected def withNewChildInternal(c: Expression): GifAnalyzeExpr = copy(child = c)
  override def prettyName: String = "gif_analyze"
}

/** Deterministic animated-GIF fixture: (seed, n_frames, w, h) → GIF
  * bytes whose frame metadata AND per-frame pixels are closed-form
  * functions of the inputs (frame k is solid webSafe(seed+k)) — the
  * oracle-gate entry point for the video-family codec.
  */
case class SynthGifExpr(first: Expression, second: Expression,
                        third: Expression, fourth: Expression)
    extends QuaternaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(LongType, IntegerType, IntegerType, IntegerType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def nullSafeEval(seed: Any, n: Any, w: Any, h: Any): Any =
    GifCodec.synthGif(seed.asInstanceOf[Long], n.asInstanceOf[Int],
      w.asInstanceOf[Int], h.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (seed, n, w, h) =>
      s"${ev.value} = graft.sources.GifCodec.synthGif($seed, $n, $w, $h);")
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression, q: Expression): SynthGifExpr =
    copy(first = f, second = s, third = t, fourth = q)
  override def prettyName: String = "synth_gif"
}

/** Column-level entry points. */
object GifOps {
  def gifInfo(bin: Column): Column =
    GraftExpr.toColumn(GifInfoExpr(GraftExpr.toExpr(bin)))
  def frameLumas(bin: Column): Column =
    GraftExpr.toColumn(GifFrameLumasExpr(GraftExpr.toExpr(bin)))
  def frameMotion(bin: Column): Column =
    GraftExpr.toColumn(GifFrameMotionExpr(GraftExpr.toExpr(bin)))
  def analyze(bin: Column): Column =
    GraftExpr.toColumn(GifAnalyzeExpr(GraftExpr.toExpr(bin)))
  def synthGif(seed: Column, nFrames: Column, w: Column, h: Column): Column =
    GraftExpr.toColumn(SynthGifExpr(GraftExpr.toExpr(seed), GraftExpr.toExpr(nFrames),
      GraftExpr.toExpr(w), GraftExpr.toExpr(h)))
}
