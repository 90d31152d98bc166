package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.artifact.{AnnBridge, AnnDataset, ArtifactStore}
import graft.catalog.Catalog

/** AnnData-bridge driver queries: build an AnnData-shaped dataset from the
  * driver tables (documents = obs, embedding dims = vars, exploded
  * embedding = X in COO form), ingest it through the REAL bridge
  * (composite directory artifact, otype=AnnData), reopen it backed, slice
  * it, and aggregate — so the whole obs/var/X round-trip sits under the
  * DuckDB oracle, which recomputes the same result from the base tables.
  */
object AnnQueries {

  /** Deterministic AnnDataset over the driver tables at `dir`. */
  def buildDataset(spark: SparkSession, dir: String): AnnDataset = {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val obs = docs.select(col("doc_id").as("obs_id"), col("lang"), col("source"), col("n_chars"))
    val vars = spark.range(64).select(col("id").as("var_id"),
      concat(lit("g"), lpad(col("id").cast("string"), 2, "0")).as("var_name"))
    val x = emb
      .select(col("vec_id").as("obs_id"), posexplode(col("embedding")).as(Seq("var_id", "value")))
      .select(col("obs_id"), col("var_id").cast("long").as("var_id"),
        col("value").cast("double").as("value"))
    AnnDataset(obs, vars, x,
      obsm = Map("X_emb" -> emb.select(col("vec_id").as("obs_id"), col("embedding"))))
  }

  /** Ingest once per (process, sf dir); hash-dedup makes re-runs return
    * the same artifact.
    */
  private val ingested = scala.collection.concurrent.TrieMap.empty[String, AnnDataset]

  def ingestedDataset(spark: SparkSession, dir: String): AnnDataset =
    ingested.getOrElseUpdate(dir, {
      val root = java.nio.file.Files.createTempDirectory("graft_ann").toString
      val cat = Catalog.deterministic(spark, root)
      val store = new ArtifactStore(cat)
      val art = AnnBridge.ingest(store, buildDataset(spark, dir), "sc/bridge.anndata", root)
      AnnBridge.open(store, art("uid").toString)
    })

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // backed obs-slicing: adata[adata.obs.lang == "en" & n_chars >= 500]
    // then a per-var aggregate over the slice (mean-expression shape)
    "a01_anndata_obs_filter" -> ((spark, dir) => {
      val ds = ingestedDataset(spark, dir)
      ds.subsetObs(col("lang") === "en" && col("n_chars") >= 500)
        .perVarStats
        .select(col("var_name"), col("n_obs"),
          round(col("sum_value").cast("double"), 6).as("sum_value"))
        .orderBy("var_name")
    }),

    // var-slicing + dense view: adata[obs.source == "src3", first 8 vars].X
    "a02_anndata_var_slice" -> ((spark, dir) => {
      val ds = ingestedDataset(spark, dir)
      val sliced = ds.subsetObs(col("source") === "src3").subsetVars(col("var_id") < 8)
      sliced.xWide().orderBy("obs_id")
    })
  )

  val oracle: Map[String, String] = Map(
    "a01_anndata_obs_filter" ->
      """WITH x AS (
        |  SELECT vec_id AS obs_id, generate_subscripts(embedding, 1) - 1 AS var_id,
        |         unnest(CAST(embedding AS DOUBLE[])) AS value
        |  FROM embeddings),
        |sel AS (SELECT doc_id FROM documents WHERE lang = 'en' AND n_chars >= 500)
        |SELECT 'g' || lpad(CAST(x.var_id AS VARCHAR), 2, '0') AS var_name,
        |       count(*) AS n_obs,
        |       round(CAST(sum(CAST(value AS DECIMAL(28,10))) AS DOUBLE), 6) AS sum_value
        |FROM x JOIN sel ON x.obs_id = sel.doc_id
        |GROUP BY 1 ORDER BY var_name""".stripMargin,

    "a02_anndata_var_slice" -> {
      val cols = (0 until 8).map(i =>
        s"max(CASE WHEN var_id = $i THEN value END) AS g0$i").mkString(", ")
      s"""WITH x AS (
         |  SELECT vec_id AS obs_id, generate_subscripts(embedding, 1) - 1 AS var_id,
         |         unnest(CAST(embedding AS DOUBLE[])) AS value
         |  FROM embeddings),
         |sel AS (SELECT doc_id FROM documents WHERE source = 'src3')
         |SELECT obs_id, $cols
         |FROM x JOIN sel ON x.obs_id = sel.doc_id
         |WHERE var_id < 8 GROUP BY obs_id ORDER BY obs_id""".stripMargin
    }
  )
}
