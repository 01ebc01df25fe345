package graft.core

/** Targeted log-noise control for the repo's runner mains and test base.
  *
  * Every global (un-partitioned) window in this codebase runs over an
  * operator-BOUNDED frame by documented contract — top-k ranks over ≤ k
  * rows, the waterfill level walk over the distinct-caps table, sweep
  * day grids — so `WindowExec`'s per-execution "No Partition Defined"
  * WARN is noise here, and at bench/suite volume it was the dominant
  * line in the captured output tails (tens of thousands of repeats),
  * burying real signals. Spark 4's optimizer removes foldable window
  * partition keys, so the `partitionBy(lit(0))` spelling does NOT
  * silence it (measured — see graft.tools.ProbeWin: the literal-keyed
  * plan optimizes to the identical SinglePartition exchange and still
  * warns); demoting the one logger is the remaining honest fix. The
  * single-partition EXCHANGE itself still shows in every committed
  * plan dump, so the cost stays visible where it is audited. */
object LogHygiene {

  /** Demote WindowExec's no-partition WARN to ERROR. Call after the
    * SparkSession exists (log4j2 is initialized by then). */
  def silenceBoundedWindowWarn(): Unit =
    try org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.execution.window.WindowExec",
      org.apache.logging.log4j.Level.ERROR)
    catch { case _: Throwable => () } // logging must never break a run
}
