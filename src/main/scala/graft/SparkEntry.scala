package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001: the SURVEY §7.2 minimum
    * slice — artifacts registered in a catalog, resolved through the
    * registry query layer (branch injection + lookups), opened as one
    * multi-path scan, aggregated TPC-H-Q1-style, with run lineage
    * recorded.
    */
  def entry(spark: SparkSession): DataFrame =
    Flagship.run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    _root_.graft.queries.CoreQueries.queries ++
      _root_.graft.queries.TextQueries.queries ++
      _root_.graft.queries.CurateQueries.queries ++
      _root_.graft.queries.PipelineQueries.queries ++
      _root_.graft.queries.ScaleQueries.queries ++
      _root_.graft.queries.AnnQueries.queries ++
      _root_.graft.queries.MixQueries.queries ++
      _root_.graft.queries.LifecycleQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a rows-only check. */
  def oracleSql: Map[String, String] =
    _root_.graft.queries.CoreQueries.oracle ++
      _root_.graft.queries.TextQueries.oracle ++
      _root_.graft.queries.CurateQueries.oracle ++
      _root_.graft.queries.PipelineQueries.oracle ++
      _root_.graft.queries.ScaleQueries.oracle ++
      _root_.graft.queries.AnnQueries.oracle ++
      _root_.graft.queries.MixQueries.oracle ++
      _root_.graft.queries.LifecycleQueries.oracle
}
