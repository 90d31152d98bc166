package graft.core

/** Gate-log hygiene (round-17 verdict ask #5): the verify/bench logs
  * carried ~250 `WARN WindowExec: No Partition Defined` lines per run,
  * burying real warnings. Every remaining global-window site in this
  * repo is verified BOUNDED and documented where it stands — the
  * k-survivor ranking after `limit(topK)` (`Retrieval.scala`), the
  * bounded label/family domains (`CoreQueries.scala`,
  * `LifecycleQueries.scala`), loader-tier index bookkeeping
  * (`MappedDataset.scala`), ingest-batch dense-id assignment
  * (`AnnBridge.scala`), and microbatch-sized obs numbering
  * (`ZarrStreamSink.scala`) — so for THIS repo the warning is category
  * noise, not a scale signal.
  *
  * Why a logger level and not a plan change: the round-17 suggestion,
  * `Window.partitionBy(lit(1))`, does not work on Spark 4 — the
  * `EliminateWindowPartitions` optimizer rule (spark-catalyst 4.1.2)
  * removes foldable partition keys before physical planning, so the
  * physical `partitionSpec` is empty again and the warning still
  * prints (measured: 233 warnings with every site literal-partitioned).
  * Restructuring the sites away from windows would trade a correct,
  * bounded single-partition plan for contortions. Instead the GATE
  * ENTRY POINTS (Verify, Bench, the measurement tools) raise this one
  * logger category to ERROR — scoped to our mains, so a library
  * consumer still sees the warning for their own, possibly unbounded,
  * global windows.
  */
object GateLog {
  def muteBoundedWindowWarning(): Unit =
    try org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.execution.window",
      org.apache.logging.log4j.Level.ERROR)
    catch { case _: Throwable => () } // absent log4j binding: keep going
}
