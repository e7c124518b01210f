package graft

/** Log hygiene for the driver mains and test session.
  *
  * `WindowExec` warns "No Partition Defined for Window operation!" on EVERY
  * unpartitioned window, including the bounded-summary ones this engine uses
  * deliberately (slice/shard/hour prefix frames — each provably ≤ a few
  * hundred rows). Dozens of benign copies flooded the r11 bench tail and
  * buried the two real offenders. The boundedness is now ENFORCED by
  * PlanSpec's catalog-wide lint (every empty-partition-spec window must read
  * an internal summary, a bounded-domain aggregate, or a limit), so the
  * blanket warning carries no information here — silence that one logger,
  * leave everything else at the session default.
  */
object Logs {
  def quietBoundedWindowWarnings(): Unit =
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.execution.window.WindowExec",
      org.apache.logging.log4j.Level.ERROR)
}
