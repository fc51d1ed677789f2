package graft.plans

import org.apache.spark.sql.{Column, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: registers graft's native
  * expressions with the SQL function registry so they are callable from
  * SQL text (`SELECT cosine_sim(a, b)`) in sessions built with
  * `spark.sql.extensions=graft.plans.GraftExtensions`. Column-API users
  * don't need the extension — see [[Functions]]. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSim].getName, "cosine_sim"),
      GraftExtensions.cosineSimBuilder))
  }
}

object GraftExtensions {
  /** The registry builder (shared with tests): wrong arity surfaces as
    * Spark's standard wrong-number-of-arguments AnalysisException, not
    * an IndexOutOfBoundsException out of the lambda. */
  val cosineSimBuilder: Seq[Expression] => Expression = {
    case Seq(a, b) => CosineSim(a, b)
    case children => throw new org.apache.spark.sql.AnalysisException(
      errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
      messageParameters = Map(
        "functionName" -> "cosine_sim",
        "expectedNum" -> "2",
        "actualNum" -> children.length.toString,
        "docroot" -> ""))
  }
}

/** Column-API access to the native expressions (session-independent). */
object Functions {
  def cosineSim(a: Column, b: Column): Column =
    org.apache.spark.sql.graftfn.columnOf(
      CosineSim(org.apache.spark.sql.graftfn.exprOf(a),
        org.apache.spark.sql.graftfn.exprOf(b)))
}
