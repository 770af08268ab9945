package graft.functions

import graft.sources.AudioCodec
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow, ImplicitCastInputTypes, QuaternaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Catalyst expressions over [[graft.sources.AudioCodec]] — the audio
  * container operators (parse metadata / RMS / windowed RMS /
  * resample / synth fixture) as codegen'd projections, mirroring
  * [[ImageExprs]]/[[PdfExprs]]. Null-in → null-out; non-WAV payloads
  * evaluate to null so query layers can coalesce onto documented
  * fallbacks.
  */
object AudioExprs {

  val InfoSchema: StructType = StructType(Seq(
    StructField("n_samples", LongType, nullable = false),
    StructField("sample_rate", LongType, nullable = false),
    StructField("channels", LongType, nullable = false),
    StructField("duration_ms", LongType, nullable = false)))

  /** Static parse-metadata helper: struct row of [[AudioCodec.wavInfo]]. */
  def wavInfoRow(bytes: Array[Byte]): InternalRow = {
    val info = AudioCodec.wavInfo(bytes)
    if (info == null) null
    else new GenericInternalRow(Array[Any](info(0), info(1), info(2), info(3)))
  }

  /** Boxed global RMS: java.lang.Long so codegen can null-propagate
    * non-WAV payloads (the codec's -1 sentinel stays internal).
    */
  def rmsBoxed(bytes: Array[Byte]): java.lang.Long = {
    val r = AudioCodec.rms(bytes)
    if (r < 0) null else java.lang.Long.valueOf(r)
  }

  /** Boxed per-window RMS array for codegen. */
  def windowRmsArray(bytes: Array[Byte], w: Int): ArrayData = {
    val a = AudioCodec.windowRms(bytes, w)
    if (a == null) null else new GenericArrayData(a)
  }
}

/** Parse metadata of a WAV payload: struct(n_samples, sample_rate,
  * channels, duration_ms); null for non-PCM16-WAV bytes.
  */
case class WavInfoExpr(child: Expression) extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(BinaryType)
  override def dataType: DataType = AudioExprs.InfoSchema
  override def nullable: Boolean = true
  override def nullSafeEval(b: Any): Any = AudioExprs.wavInfoRow(b.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => {
      val r = ctx.freshName("wavInfo")
      s"""
         |InternalRow $r = graft.functions.AudioExprs.wavInfoRow($b);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
       """.stripMargin
    })
  override protected def withNewChildInternal(c: Expression): WavInfoExpr = copy(child = c)
  override def prettyName: String = "wav_info"
}

/** Integer global RMS of a WAV payload (exact for the square-wave
  * fixture); null for non-WAV bytes.
  */
case class AudioRmsExpr(child: Expression) extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(BinaryType)
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def nullSafeEval(b: Any): Any = {
    val r = AudioExprs.rmsBoxed(b.asInstanceOf[Array[Byte]])
    if (r == null) null else r.longValue()
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => {
      val r = ctx.freshName("rms")
      s"""
         |java.lang.Long $r = graft.functions.AudioExprs.rmsBoxed($b);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r.longValue(); }
       """.stripMargin
    })
  override protected def withNewChildInternal(c: Expression): AudioRmsExpr = copy(child = c)
  override def prettyName: String = "audio_rms"
}

/** Per-window integer RMS (VAD segmentation primitive): (wav,
  * window_samples) → array<bigint>; null for non-WAV bytes.
  */
case class AudioWindowRmsExpr(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(BinaryType, IntegerType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def nullSafeEval(b: Any, w: Any): Any =
    AudioExprs.windowRmsArray(b.asInstanceOf[Array[Byte]], w.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (b, w) => {
      val r = ctx.freshName("winRms")
      s"""
         |ArrayData $r = graft.functions.AudioExprs.windowRmsArray($b, $w);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
       """.stripMargin
    })
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): AudioWindowRmsExpr = copy(left = l, right = r)
  override def prettyName: String = "audio_window_rms"
}

/** Exact-rational linear resample to a target rate: (wav, rate) →
  * WAV bytes; null for non-WAV / non-mono payloads.
  */
case class AudioResampleExpr(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(BinaryType, IntegerType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def nullSafeEval(b: Any, rate: Any): Any =
    AudioCodec.resample(b.asInstanceOf[Array[Byte]], rate.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (b, rate) => {
      val r = ctx.freshName("resampled")
      s"""
         |byte[] $r = graft.sources.AudioCodec.resample($b, $rate);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
       """.stripMargin
    })
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): AudioResampleExpr = copy(left = l, right = r)
  override def prettyName: String = "audio_resample"
}

/** Deterministic synthetic WAV fixture: (seed, window_samples, rate,
  * silence_mask) → PCM16 bytes whose analysis metadata is a
  * closed-form function of the inputs (amp = 1000 + seed % 9000;
  * 8 windows; window RMS = amp or 0 by mask bit) — the oracle-gate
  * entry point for the audio codec.
  */
case class SynthWavExpr(first: Expression, second: Expression,
                        third: Expression, fourth: Expression)
    extends QuaternaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(LongType, IntegerType, IntegerType, IntegerType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def nullSafeEval(seed: Any, w: Any, rate: Any, mask: Any): Any =
    AudioCodec.synthWav(seed.asInstanceOf[Long], w.asInstanceOf[Int],
      rate.asInstanceOf[Int], mask.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (seed, w, rate, mask) =>
      s"${ev.value} = graft.sources.AudioCodec.synthWav($seed, $w, $rate, $mask);")
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression, q: Expression): SynthWavExpr =
    copy(first = f, second = s, third = t, fourth = q)
  override def prettyName: String = "synth_wav"
}

/** Column-level entry points. */
object AudioOps {
  def wavInfo(bin: Column): Column =
    GraftExpr.toColumn(WavInfoExpr(GraftExpr.toExpr(bin)))
  def audioRms(bin: Column): Column =
    GraftExpr.toColumn(AudioRmsExpr(GraftExpr.toExpr(bin)))
  def audioWindowRms(bin: Column, windowSamples: Column): Column =
    GraftExpr.toColumn(AudioWindowRmsExpr(
      GraftExpr.toExpr(bin), GraftExpr.toExpr(windowSamples)))
  def audioResample(bin: Column, rate: Column): Column =
    GraftExpr.toColumn(AudioResampleExpr(GraftExpr.toExpr(bin), GraftExpr.toExpr(rate)))
  def synthWav(seed: Column, windowSamples: Column, rate: Column, mask: Column): Column =
    GraftExpr.toColumn(SynthWavExpr(GraftExpr.toExpr(seed), GraftExpr.toExpr(windowSamples),
      GraftExpr.toExpr(rate), GraftExpr.toExpr(mask)))
}
