package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Catalyst surface of the unigram-LM tokenizer
  * ([[graft.operators.Unigram]]): Viterbi segmentation as a codegen'd
  * per-row fold. The trained model (piece → integer cost, ≤ vocabSize
  * entries) rides along as a codegen reference object — the same
  * bounded-model-state shape as the BPE merge chain, just looked up
  * per candidate instead of folded into literals.
  */
object UnigramExprs {

  val SegSchema: StructType = StructType(Seq(
    StructField("c", LongType, nullable = false),
    StructField("k", LongType, nullable = false),
    StructField("p", StringType, nullable = false)))

  /** Boxed eval: word → struct(c, k, p). */
  def segmentRow(word: UTF8String,
                 model: java.util.HashMap[String, java.lang.Long]): InternalRow = {
    val (c, k, p) = graft.operators.Unigram.viterbi(word.toString, model)
    new GenericInternalRow(Array[Any](c, k, UTF8String.fromString(p)))
  }
}

/** Maximum-likelihood unigram segmentation of a word under a trained
  * model: struct(c = integer cost in 2^-16 log2-units, k = piece
  * count, p = space-joined pieces). Null-in → null-out.
  */
case class UnigramSegmentExpr(child: Expression, model: Seq[(String, Long)])
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = UnigramExprs.SegSchema
  override def nullable: Boolean = true

  @transient private lazy val modelMap: java.util.HashMap[String, java.lang.Long] = {
    val m = new java.util.HashMap[String, java.lang.Long](model.size * 2)
    model.foreach { case (p, c) => m.put(p, java.lang.Long.valueOf(c)) }
    m
  }

  override def nullSafeEval(w: Any): Any =
    UnigramExprs.segmentRow(w.asInstanceOf[UTF8String], modelMap)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mapRef = ctx.addReferenceObj("unigramModel", modelMap,
      "java.util.HashMap<String, Long>")
    nullSafeCodeGen(ctx, ev, w =>
      s"${ev.value} = graft.functions.UnigramExprs.segmentRow($w, $mapRef);")
  }

  override protected def withNewChildInternal(c: Expression): UnigramSegmentExpr =
    copy(child = c)
  override def prettyName: String = "unigram_segment"
}
