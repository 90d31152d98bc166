package graft

import java.nio.file.Files
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.artifact.ArtifactStore
import graft.catalog.Catalog
import graft.lineage.Lineage
import graft.query.QuerySet

/** SURVEY §7.2 minimum end-to-end slice: init a catalog → track a run →
  * register parquet artifacts → resolve them back through the registry
  * query layer (branch injection + lookups) → open as one multi-path scan
  * → TPC-H-Q1-shaped aggregation, with run-input lineage recorded.
  */
object Flagship {
  def run(spark: SparkSession, sfDir: String): DataFrame = {
    val root = Files.createTempDirectory("graft-instance").toString
    val cat = Catalog.deterministic(spark, root)
    val store = new ArtifactStore(cat)
    val lineage = new Lineage(cat)

    lineage.track("flagship.scala", "entry-query-v1")
    store.registerPath(s"$sfDir/lineitem.parquet", "tpch/lineitem.parquet", root, kind = "dataset")
    store.registerPath(s"$sfDir/orders.parquet", "tpch/orders.parquet", root, kind = "dataset")

    // resolve through the registry query layer: branch injection applies
    val artifacts = store.querySet
      .filter("suffix" -> ".parquet", "key__contains" -> "lineitem")
      .df
    val li = store.open(artifacts)
    lineage.finish()

    li.filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity")).as("sum_qty"),
        avg(col("l_extendedprice")).as("avg_price"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag", "l_linestatus")
  }
}
