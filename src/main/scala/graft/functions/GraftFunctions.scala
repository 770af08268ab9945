package graft.functions

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL registration for the engine's scalar surface: after
  * `GraftFunctions.register(spark)` (imperative, session-local) or with
  * `spark.sql.extensions=graft.functions.GraftExtensions` (config-driven,
  * every new session on the cluster), `spark.sql` queries can call
  * `norm`, `file_ext`, `infer_mime`, `ext_from_name_or_mime`,
  * `sanitize_name`, `signed_filename`, `escape_for_q`, `stable_hash60`
  * directly — the same expressions the Column API builds, so plans and
  * codegen are identical either way.
  */
object GraftFunctions {

  /** The single source of truth: SQL name → Column-level builder.
    * Both registration paths (temp-function registry and
    * SparkSessionExtensions) derive from this table.
    */
  val scalar: Seq[(String, Seq[Column] => Column)] = Seq(
    "norm" -> (a => Normalize.norm(a.head)),
    "file_ext" -> (a => StringOps.fileExt(a.head)),
    "sanitize_name" -> (a => StringOps.sanitizeName(a.head)),
    "signed_filename" -> (a => StringOps.signedFilename(a.head)),
    "escape_for_q" -> (a => StringOps.escapeForQ(a.head)),
    "stable_hash60" -> (a => Hashing.stableHash60(a.head)),
    "infer_mime" -> (a => StringOps.inferMime(a.head, a(1))),
    "ext_from_name_or_mime" -> (a => StringOps.extFromNameOrMime(a.head, a(1))),
    "stamp_text" -> (a => StringOps.stampText(a.head, a(1))),
    "item_name_or" -> (a => StringOps.itemNameOr(a.head, a(1))),
    "contains_any" -> (a => ContainsAnyCol.containsAny(a.head, a(1))),
    // dot_fold(a, b, dim): dim must be an integer literal — it sizes
    // the compiled loop at plan time, exactly like the Column API.
    "dot_fold" -> (a => {
      import org.apache.spark.sql.catalyst.expressions.Literal
      val dim = GraftExpr.toExpr(a(2)) match {
        case Literal(v: Int, _) => v
        case Literal(v: Long, _) => v.toInt
        case other => throw new IllegalArgumentException(
          s"dot_fold dim must be a literal integer, got $other")
      }
      DotProductCol.dot(a.head, a(1), dim)
    }))

  private[functions] def builder(f: Seq[Column] => Column): Seq[Expression] => Expression =
    exprs => GraftExpr.toExpr(f(exprs.map(GraftExpr.toColumn)))

  def register(session: SparkSession): Unit =
    scalar.foreach { case (name, f) =>
      session.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder(f), "scala_udf")
    }
}

/** Config-driven injection of the scalar surface
  * (`--conf spark.sql.extensions=graft.functions.GraftExtensions`):
  * the sanctioned deployment hook for adding engine functions (and,
  * when needed, rules/strategies) to EVERY session on a cluster with no
  * imperative `register()` call in user code.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.scalar.foreach { case (name, f) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftExtensions].getName, name),
        GraftFunctions.builder(f)))
    }
    ext.injectOptimizerRule(_ => NormIdempotence)
  }
}
