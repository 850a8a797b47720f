package org.apache.spark.sql

import org.apache.spark.sql.catalyst.analysis.FunctionRegistry

/** Test-only accessor for the `private[sql]` extension internals:
  * applies an extension's injected functions to a cloned registry and
  * reports what it added. */
object ExtensionsProbe {
  def registeredNames(ext: SparkSessionExtensions): Seq[String] = {
    val reg = FunctionRegistry.builtin.clone()
    val before = reg.listFunction().toSet
    ext.registerFunctions(reg)
    reg.listFunction().filterNot(before).map(_.funcName)
  }
}
