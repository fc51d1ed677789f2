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
      (children: Seq[Expression]) => CosineSim(children(0), children(1))))
  }
}

/** Column-API access to the native expressions (session-independent). */
object Functions {
  def cosineSim(a: Column, b: Column): Column =
    org.apache.spark.sql.graftfn.columnOf(
      CosineSim(org.apache.spark.sql.graftfn.exprOf(a),
        org.apache.spark.sql.graftfn.exprOf(b)))
}
