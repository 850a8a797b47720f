package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session extension (`spark.sql.extensions=graft.functions.GraftExtensions`):
  * registers the engine's native codegen'd expressions in the SQL
  * function registry (so `spark.sql("SELECT cosine_sim(a, b) ...")`
  * works without the Scala DSL) and injects the heap-based top-k
  * optimizer rule + strategy ([[graft.plans.TopKPerKey]]). Complements
  * [[VectorExpressions.register]] / [[graft.plans.TopKPerKeyPlans.install]]
  * which do the same per-session.
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
    e.injectOptimizerRule(_ => graft.plans.RewriteTopKWindow)
    e.injectPlannerStrategy(_ => graft.plans.TopKStrategy)
  }
}
