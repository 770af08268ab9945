package graft.functions

import graft.sources.AvroCodec
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Catalyst expressions over [[graft.sources.AvroCodec]] — container
  * parse / decode as codegen'd projections, mirroring the other codec
  * expression families. Null-in → null-out; malformed payloads
  * evaluate to null (poison-guard) rather than throwing.
  */
object AvroExprs {

  val MetaSchema: StructType = StructType(Seq(
    StructField("schema_name", StringType, nullable = false),
    StructField("codec", StringType, nullable = false),
    StructField("n_blocks", LongType, nullable = false),
    StructField("n_records", LongType, nullable = false),
    StructField("n_fields", LongType, nullable = false)))

  def avroMetaRow(bytes: Array[Byte]): InternalRow =
    try {
      val c = AvroCodec.read(bytes)
      new GenericInternalRow(Array[Any](
        UTF8String.fromString(c.schema.name), UTF8String.fromString(c.codec),
        c.nBlocks.toLong, c.records.length.toLong, c.schema.fields.length.toLong))
    } catch { case _: Exception => null }

  val RecordSchema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("name", StringType, nullable = true),
    StructField("score", DoubleType, nullable = false),
    StructField("flag", BooleanType, nullable = false),
    StructField("payload_sum", LongType, nullable = false)))

  /** Records of a FIXTURE-SCHEMA container as typed structs (payload
    * reduced to its byte sum for SQL comparability); null when the
    * container doesn't parse or doesn't carry the fixture schema.
    * Generic decoding is [[AvroCodec.read]] (spec-covered over
    * arbitrary subset schemas); this is the gate's typed view.
    */
  def avroRecords(bytes: Array[Byte]): ArrayData =
    try {
      val c = AvroCodec.read(bytes)
      if (c.schema != AvroCodec.FixtureSchema) return null
      new GenericArrayData(c.records.map { r =>
        val payload = r(4).asInstanceOf[Array[Byte]]
        var ps = 0L
        payload.foreach(b => ps += (b & 0xff))
        new GenericInternalRow(Array[Any](
          r(0).asInstanceOf[Long],
          if (r(1) == null) null else UTF8String.fromString(r(1).asInstanceOf[String]),
          r(2).asInstanceOf[Double],
          r(3).asInstanceOf[Boolean],
          ps)): Any
      }.toArray)
    } catch { case _: Exception => null }
}

/** Container metadata of an Avro payload; null for non-Avro bytes. */
case class AvroMetaExpr(child: Expression) extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(BinaryType)
  override def dataType: DataType = AvroExprs.MetaSchema
  override def nullable: Boolean = true
  override def nullSafeEval(b: Any): Any = AvroExprs.avroMetaRow(b.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => {
      val r = ctx.freshName("avroMeta")
      s"""
         |InternalRow $r = graft.functions.AvroExprs.avroMetaRow($b);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
       """.stripMargin
    })
  override protected def withNewChildInternal(c: Expression): AvroMetaExpr = copy(child = c)
  override def prettyName: String = "avro_meta"
}

/** Fixture-schema records of an Avro container; null for non-Avro or
  * other-schema payloads.
  */
case class AvroRecordsExpr(child: Expression) extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(BinaryType)
  override def dataType: DataType = ArrayType(AvroExprs.RecordSchema, containsNull = false)
  override def nullable: Boolean = true
  override def nullSafeEval(b: Any): Any = AvroExprs.avroRecords(b.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => {
      val r = ctx.freshName("avroRecs")
      s"""
         |ArrayData $r = graft.functions.AvroExprs.avroRecords($b);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
       """.stripMargin
    })
  override protected def withNewChildInternal(c: Expression): AvroRecordsExpr = copy(child = c)
  override def prettyName: String = "avro_records"
}

/** Deterministic Avro container fixture ([[AvroCodec.synthAvro]]):
  * (seed, n) → container bytes whose every record value is closed-form
  * — deflate codec on odd seeds, 2 records per block.
  */
case class SynthAvroExpr(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(LongType, IntegerType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def nullSafeEval(seed: Any, n: Any): Any =
    AvroCodec.synthAvro(seed.asInstanceOf[Long], n.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (seed, n) =>
      s"${ev.value} = graft.sources.AvroCodec.synthAvro($seed, $n);")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): SynthAvroExpr =
    copy(left = l, right = r)
  override def prettyName: String = "synth_avro"
}

/** Column-API wrappers. */
object AvroOps {
  def avroMeta(bin: Column): Column =
    GraftExpr.toColumn(AvroMetaExpr(GraftExpr.toExpr(bin)))
  def avroRecords(bin: Column): Column =
    GraftExpr.toColumn(AvroRecordsExpr(GraftExpr.toExpr(bin)))
  def synthAvro(seed: Column, n: Column): Column =
    GraftExpr.toColumn(SynthAvroExpr(GraftExpr.toExpr(seed), GraftExpr.toExpr(n)))
}
