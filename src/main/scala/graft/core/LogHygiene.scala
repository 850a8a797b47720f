package graft.core

/** Targeted log-noise control for the engine's entry points. */
object LogHygiene {

  /** WindowExec warns "No Partition Defined … single partition" once
    * per planned global window. Every such window in this engine is a
    * deliberate bounded re-rank over ≤ k already-limited rows
    * (GraftFunctions.boundedWindow marks each site; Catalyst folds the
    * constant partition key away, so the spec still plans as a global
    * window). On a full inventory run the warning fires dozens of
    * times and buries real WindowExec signals, so THAT one logger is
    * raised to ERROR; unbounded-window hazards are guarded
    * structurally by PlanSpec instead of by log reading. */
  def quietWindowWarnings(): Unit =
    try org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.execution.window.WindowExec",
      org.apache.logging.log4j.Level.ERROR)
    catch { case _: Throwable => () } // logging must never break the job
}
