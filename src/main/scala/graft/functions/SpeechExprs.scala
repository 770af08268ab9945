package graft.functions

import graft.sources.{FlacCodec, SubtitleCodec}
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow, ImplicitCastInputTypes, QuaternaryExpression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Catalyst surface over the speech-corpus codecs: FLAC
  * ([[graft.sources.FlacCodec]]) and SRT/WebVTT transcripts
  * ([[graft.sources.SubtitleCodec]]). FLAC decodes to canonical WAV
  * bytes so the whole existing audio analysis layer (RMS, VAD windows,
  * resample) composes unchanged; transcripts explode to cue grain for
  * alignment joins. Null-in → null-out; undecodable payloads null
  * (poison-guard), like every other codec entry point.
  */
object SpeechExprs {

  val CueSchema: StructType = StructType(Seq(
    StructField("idx", IntegerType, nullable = false),
    StructField("start_ms", LongType, nullable = false),
    StructField("end_ms", LongType, nullable = false),
    StructField("text", StringType, nullable = false)))

  def flacInfoRow(bytes: Array[Byte]): InternalRow = {
    val i = FlacCodec.flacInfo(bytes)
    if (i == null) null
    else new GenericInternalRow(Array[Any](i(0), i(1), i(2), i(3), i(4)))
  }

  def flacToWav(bytes: Array[Byte]): Array[Byte] =
    try FlacCodec.flacToWav(bytes)
    catch { case _: Exception => null }

  def parseCuesArray(doc: UTF8String): org.apache.spark.sql.catalyst.util.ArrayData =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      SubtitleCodec.parseCues(doc.toString).map { c =>
        new GenericInternalRow(Array[Any](
          c.idx, c.startMs, c.endMs, UTF8String.fromString(c.text))): Any
      })
}

/** `flac_info(bin)` → struct(n_samples, sample_rate, channels, bits,
  * duration_ms) from STREAMINFO; null for non-FLAC bytes.
  */
case class FlacInfoExpr(child: Expression) extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(BinaryType)
  override def dataType: DataType = StructType(Seq(
    "n_samples", "sample_rate", "channels", "bits", "duration_ms")
    .map(f => StructField(f, LongType, nullable = false)))
  override def nullable: Boolean = true
  override def nullSafeEval(b: Any): Any = SpeechExprs.flacInfoRow(b.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => {
      val r = ctx.freshName("flacInfo")
      s"""
         |InternalRow $r = graft.functions.SpeechExprs.flacInfoRow($b);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
       """.stripMargin
    })
  override protected def withNewChildInternal(c: Expression): FlacInfoExpr = copy(child = c)
  override def prettyName: String = "flac_info"
}

/** `flac_to_wav(bin)` — full decode (subframes, Rice residuals,
  * decorrelation, CRCs verified) re-encoded as canonical WAV bytes;
  * null for undecodable payloads.
  */
case class FlacToWavExpr(child: Expression) extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(BinaryType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def nullSafeEval(b: Any): Any = SpeechExprs.flacToWav(b.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => {
      val r = ctx.freshName("flacWav")
      s"""
         |byte[] $r = graft.functions.SpeechExprs.flacToWav($b);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
       """.stripMargin
    })
  override protected def withNewChildInternal(c: Expression): FlacToWavExpr = copy(child = c)
  override def prettyName: String = "flac_to_wav"
}

/** `synth_flac(seed, w_samples, rate, silence_mask)` — the square-wave
  * fixture FLAC-encoded ([[FlacCodec.synthFlac]]); odd seeds emit
  * stereo with an inverted right channel (mid/side frames do real
  * work), even seeds mono.
  */
case class SynthFlacExpr(first: Expression, second: Expression,
                         third: Expression, fourth: Expression)
    extends QuaternaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(LongType, IntegerType, IntegerType, IntegerType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def nullSafeEval(seed: Any, w: Any, rate: Any, mask: Any): Any = {
    val s = seed.asInstanceOf[Long]
    FlacCodec.synthFlac(s, w.asInstanceOf[Int], rate.asInstanceOf[Int],
      mask.asInstanceOf[Int], stereo = s % 2 == 1)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (seed, w, rate, mask) =>
      s"${ev.value} = graft.sources.FlacCodec.synthFlac($seed, $w, $rate, $mask, $seed % 2 == 1);")
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression, q: Expression): SynthFlacExpr =
    copy(first = f, second = s, third = t, fourth = q)
  override def prettyName: String = "synth_flac"
}

/** `parse_cues(text)` → array of {idx, start_ms, end_ms, text} — SRT
  * or WebVTT auto-detected ([[SubtitleCodec.parseCues]]).
  */
case class ParseCuesExpr(child: Expression) extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = ArrayType(SpeechExprs.CueSchema, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def nullSafeEval(t: Any): Any = SpeechExprs.parseCuesArray(t.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.SpeechExprs.parseCuesArray($t);")
  override protected def withNewChildInternal(c: Expression): ParseCuesExpr = copy(child = c)
  override def prettyName: String = "parse_cues"
}

/** `synth_srt(seed, n)` / `synth_vtt(seed, n)` — transcript fixtures
  * on the shared closed-form cue schedule.
  */
case class SynthSrtExpr(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(LongType, IntegerType)
  override def dataType: DataType = StringType
  override def nullable: Boolean = left.nullable || right.nullable
  override def nullSafeEval(seed: Any, n: Any): Any =
    UTF8String.fromString(SubtitleCodec.synthSrt(seed.asInstanceOf[Long], n.asInstanceOf[Int]))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, n) =>
      s"${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.sources.SubtitleCodec.synthSrt($s, $n));")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): SynthSrtExpr =
    copy(left = l, right = r)
  override def prettyName: String = "synth_srt"
}

case class SynthVttExpr(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(LongType, IntegerType)
  override def dataType: DataType = StringType
  override def nullable: Boolean = left.nullable || right.nullable
  override def nullSafeEval(seed: Any, n: Any): Any =
    UTF8String.fromString(SubtitleCodec.synthVtt(seed.asInstanceOf[Long], n.asInstanceOf[Int]))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, n) =>
      s"${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.sources.SubtitleCodec.synthVtt($s, $n));")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): SynthVttExpr =
    copy(left = l, right = r)
  override def prettyName: String = "synth_vtt"
}

/** Column-API wrappers. */
object SpeechOps {
  def flacInfo(bin: Column): Column =
    GraftExpr.toColumn(FlacInfoExpr(GraftExpr.toExpr(bin)))
  def flacToWav(bin: Column): Column =
    GraftExpr.toColumn(FlacToWavExpr(GraftExpr.toExpr(bin)))
  def synthFlac(seed: Column, wSamples: Column, rate: Column, mask: Column): Column =
    GraftExpr.toColumn(SynthFlacExpr(GraftExpr.toExpr(seed), GraftExpr.toExpr(wSamples),
      GraftExpr.toExpr(rate), GraftExpr.toExpr(mask)))
  def parseCues(text: Column): Column =
    GraftExpr.toColumn(ParseCuesExpr(GraftExpr.toExpr(text)))
  def synthSrt(seed: Column, n: Column): Column =
    GraftExpr.toColumn(SynthSrtExpr(GraftExpr.toExpr(seed), GraftExpr.toExpr(n)))
  def synthVtt(seed: Column, n: Column): Column =
    GraftExpr.toColumn(SynthVttExpr(GraftExpr.toExpr(seed), GraftExpr.toExpr(n)))
}
