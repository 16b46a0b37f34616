package graft.util

/** Targeted log-noise control for the bench/verify mains and tests.
  *
  * The segment lifecycle unpersists local-checkpointed leaves BY DESIGN
  * (the leaf is dead: its successor segment is already materialized, and
  * lineage was truncated precisely so predecessors become collectable).
  * Spark warns "cannot be recomputed after unpersisting" on every such
  * release — hundreds of identical lines per bench run that bury real
  * warnings. Only that one logger is raised to ERROR; everything else
  * keeps the session's WARN level.
  */
object LogQuiet {
  def apply(): Unit =
    try org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.rdd.MapPartitionsRDD", org.apache.logging.log4j.Level.ERROR)
    catch { case _: Throwable => () } // logging backend absent/different: keep the noise
}
