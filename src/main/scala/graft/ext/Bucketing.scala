package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table utilities for co-located joins (SURVEY scale notes:
  * "repartition/bucketing for co-located joins").
  *
  * Writing both sides of a recurring equi-join bucketed by the join key
  * into the warehouse lets Spark plan a SortMergeJoin with NO shuffle
  * exchange on either side — at 100 TB the dominant join cost is the
  * shuffle, so for fact-fact joins that repeat across a pipeline the
  * one-time bucketed write amortizes immediately. Bucket counts should
  * match (or divide) across the joined tables.
  */
object Bucketing {

  /** Persist `df` as a bucketed+sorted managed table. */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
                    nBuckets: Int, sortCol: Option[String] = None): Unit = {
    val w = df.write.mode("overwrite").bucketBy(nBuckets, bucketCol)
    sortCol.fold(w)(c => w.sortBy(c)).saveAsTable(table)
  }

  /** Join two bucketed tables on their bucket keys. With equal bucket
    * counts the planner elides both shuffle exchanges (verify with
    * `hasShuffle` below).
    */
  def bucketedJoin(spark: SparkSession, leftTable: String, rightTable: String,
                   leftKey: String, rightKey: String): DataFrame = {
    val l = spark.table(leftTable)
    val r = spark.table(rightTable)
    l.join(r, l(leftKey) === r(rightKey))
  }

  /** True if the executed plan contains a shuffle exchange — the thing
    * bucketing exists to remove. Executes the frame first so AQE's final
    * plan (hidden from child traversal inside AdaptiveSparkPlanExec) is
    * what gets inspected.
    */
  def hasShuffle(df: DataFrame): Boolean = {
    df.foreach(_ => ())
    val s = df.queryExecution.executedPlan.toString
    s.contains("Exchange hashpartitioning") || s.contains("ShuffleExchange")
  }

  /** Write hive-style partitioned parquet: directory pruning turns a
    * partition-key predicate into "read only those directories" — at
    * 100 TB this is the difference between scanning a day and scanning
    * the lake. Pair with `partitionsRead` to verify pruning.
    */
  def writePartitioned(df: DataFrame, path: String, partitionCol: String): Unit =
    df.write.mode("overwrite").partitionBy(partitionCol).parquet(path)

  /** Number of partition directories a scan will actually read — the
    * FileSourceScan's post-pruning selected-partition count.
    */
  def partitionsRead(df: DataFrame): Long =
    df.queryExecution.executedPlan.collectLeaves().collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.selectedPartitions.partitionCount.toLong
    }.getOrElse(-1L)
}
