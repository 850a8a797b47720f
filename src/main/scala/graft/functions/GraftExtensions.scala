package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session extension (`spark.sql.extensions=graft.functions.GraftExtensions`)
  * registering the engine's native codegen'd expressions in the SQL
  * function registry, so `spark.sql("SELECT cosine_sim(a, b) ...")`
  * works without the Scala DSL. Complements
  * [[VectorExpressions.register]] which does the same per-session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[DotProduct].getName, null, name, usage, "")

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((FunctionIdentifier("dot_product"),
      info("dot_product", "dot_product(a, b) - float-vector dot product"),
      (exprs: Seq[Expression]) => DotProduct(exprs(0), exprs(1))))
    e.injectFunction((FunctionIdentifier("cosine_sim"),
      info("cosine_sim", "cosine_sim(a, b) - float-vector cosine similarity"),
      (exprs: Seq[Expression]) => CosineSim(exprs(0), exprs(1))))
  }
}
