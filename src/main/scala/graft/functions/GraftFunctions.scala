package graft.functions

import org.apache.spark.sql.{Column, SparkSession}

/** SQL registration for the engine's scalar surface: after
  * `GraftFunctions.register(spark)`, `spark.sql` queries can call
  * `norm`, `file_ext`, `infer_mime`, `ext_from_name_or_mime`,
  * `sanitize_name`, `signed_filename`, `escape_for_q`, `stable_hash60`
  * directly — the same expressions the Column API builds, so plans and
  * codegen are identical either way.
  */
object GraftFunctions {
  private def oneArg(name: String, f: Column => Column)(implicit spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, exprs => GraftExpr.toExpr(f(GraftExpr.toColumn(exprs.head))), "scala_udf")

  private def twoArg(name: String, f: (Column, Column) => Column)(implicit spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, exprs => GraftExpr.toExpr(
        f(GraftExpr.toColumn(exprs.head), GraftExpr.toColumn(exprs(1)))), "scala_udf")

  def register(session: SparkSession): Unit = {
    implicit val spark: SparkSession = session
    oneArg("norm", Normalize.norm)
    oneArg("file_ext", StringOps.fileExt)
    oneArg("sanitize_name", StringOps.sanitizeName)
    oneArg("signed_filename", n => StringOps.signedFilename(n))
    oneArg("escape_for_q", StringOps.escapeForQ)
    oneArg("stable_hash60", Hashing.stableHash60)
    twoArg("infer_mime", StringOps.inferMime)
    twoArg("ext_from_name_or_mime", StringOps.extFromNameOrMime)
    twoArg("stamp_text", StringOps.stampText)
    twoArg("item_name_or", StringOps.itemNameOr)
  }
}
