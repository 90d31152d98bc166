package graft.lineage

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.catalog.Catalog

/** Human-readable record trees (`lamindb/models/_describe.py`): a compact
  * formatted view of an artifact with its provenance, features and
  * labels — assembled from catalog joins, collected only at render time.
  */
object Describe {

  /** Structured describe tree — the DataFrame twin of [[artifact]]:
    * one row per tree entry as (section, item, detail, value), assembled
    * entirely from catalog joins (no driver rendering). Sections mirror
    * the reference's `_describe.py` blocks: `core` (uid/key/suffix/…),
    * `provenance` (producing run + transform), `feature` (name, dtype,
    * JSON value) and `label` (linked ulabels). Callers render or filter
    * (e.g. down to store-independent items for cross-engine compare).
    */
  private def entry(section: String, item: String, detail: org.apache.spark.sql.Column,
            value: org.apache.spark.sql.Column) =
    struct(lit(section).as("section"), lit(item).as("item"),
      detail.cast("string").as("detail"), value.cast("string").as("value"))

  def rows(cat: Catalog, artifactId: Long): DataFrame = {
    val art = cat.table("artifact").filter(col("id") === artifactId)
    val core = art.select(explode(array(
      entry("core", "uid", lit(null), col("uid")),
      entry("core", "key", lit(null), col("key")),
      entry("core", "suffix", lit(null), col("suffix")),
      entry("core", "kind", lit(null), col("kind")),
      entry("core", "size", lit(null), col("size")),
      entry("core", "hash", col("hash_type"), col("hash")),
      entry("core", "branch", lit(null), col("branch_id")),
      entry("core", "is_latest", lit(null), col("is_latest")))).as("e"))
      .select("e.*")
    val provenance = art.select(col("run_id"))
      .join(cat.table("run").select(col("id").as("run_id"),
        col("transform_id"), col("status_code")), "run_id")
      .join(cat.table("transform").select(col("id").as("transform_id"),
        col("key").as("tkey")), "transform_id")
      .select(lit("provenance").as("section"), lit("run").as("item"),
        col("tkey").cast("string").as("detail"),
        col("status_code").cast("string").as("value"))
    val features = cat.table("artifact_json_values")
      .filter(col("artifact_id") === artifactId)
      .join(cat.table("json_value")
        .select(col("id").as("json_value_id"), col("feature_id"), col("value_json")),
        "json_value_id")
      .join(cat.table("feature")
        .select(col("id").as("feature_id"), col("name"), col("dtype")), "feature_id")
      .select(lit("feature").as("section"), col("name").as("item"),
        col("dtype").cast("string").as("detail"), col("value_json").as("value"))
    val labels = cat.table("artifact_ulabels")
      .filter(col("artifact_id") === artifactId)
      .join(cat.table("ulabel").select(col("id").as("ulabel_id"), col("name")), "ulabel_id")
      .select(lit("label").as("section"), col("name").as("item"),
        lit(null).cast("string").as("detail"), lit("linked").as("value"))
    core.unionByName(provenance).unionByName(features).unionByName(labels)
  }

  /** Batched twin of [[rows]]: the same four describe sections for MANY
    * artifacts in ONE plan, each tagged with its caller-supplied key as
    * `art_key`. Per-id `rows` unioned N ways builds an O(N·sections)
    * physical plan (q46 at 5 shards planned 584 operators — planning and
    * 5× repeated catalog scans dominate the wall); here every section
    * scans each catalog table once with an `isin` id filter, so the plan
    * is O(sections) regardless of N. Row set per id is identical to
    * `rows(cat, id)` by construction (same projections, same inner-join
    * provenance semantics — a null run_id drops the provenance row in
    * both shapes), pinned by the q46 DuckDB oracle.
    */
  def rowsMany(cat: Catalog, keyedIds: Seq[(String, Long)]): DataFrame = {
    val spark = cat.table("artifact").sparkSession
    val keyById = spark.createDataFrame(
      keyedIds.map { case (k, id) => (id, k) }).toDF("__art_id", "art_key")
    // id scoping via a broadcast semi-join against the SAME keyById
    // frame the final key-attach uses — an `isin` literal list is O(N)
    // expression nodes and blows up codegen at thousands of ids, which
    // would silently reintroduce the plan-size pathology this function
    // exists to remove (r18 review)
    val idSet = broadcast(keyById.select(col("__art_id").as("id")))
    val art = cat.table("artifact").join(idSet, Seq("id"), "left_semi")
    val core = art.select(col("id").as("__art_id"), explode(array(
      entry("core", "uid", lit(null), col("uid")),
      entry("core", "key", lit(null), col("key")),
      entry("core", "suffix", lit(null), col("suffix")),
      entry("core", "kind", lit(null), col("kind")),
      entry("core", "size", lit(null), col("size")),
      entry("core", "hash", col("hash_type"), col("hash")),
      entry("core", "branch", lit(null), col("branch_id")),
      entry("core", "is_latest", lit(null), col("is_latest")))).as("e"))
      .select(col("__art_id"), col("e.section"), col("e.item"),
        col("e.detail"), col("e.value"))
    val provenance = art.select(col("id").as("__art_id"), col("run_id"))
      .join(cat.table("run").select(col("id").as("run_id"),
        col("transform_id"), col("status_code")), "run_id")
      .join(cat.table("transform").select(col("id").as("transform_id"),
        col("key").as("tkey")), "transform_id")
      .select(col("__art_id"), lit("provenance").as("section"),
        lit("run").as("item"), col("tkey").cast("string").as("detail"),
        col("status_code").cast("string").as("value"))
    val features = cat.table("artifact_json_values")
      .join(idSet.withColumnRenamed("id", "artifact_id"), Seq("artifact_id"), "left_semi")
      .join(cat.table("json_value")
        .select(col("id").as("json_value_id"), col("feature_id"), col("value_json")),
        "json_value_id")
      .join(cat.table("feature")
        .select(col("id").as("feature_id"), col("name"), col("dtype")), "feature_id")
      .select(col("artifact_id").as("__art_id"), lit("feature").as("section"),
        col("name").as("item"), col("dtype").cast("string").as("detail"),
        col("value_json").as("value"))
    val labels = cat.table("artifact_ulabels")
      .join(idSet.withColumnRenamed("id", "artifact_id"), Seq("artifact_id"), "left_semi")
      .join(cat.table("ulabel").select(col("id").as("ulabel_id"), col("name")), "ulabel_id")
      .select(col("artifact_id").as("__art_id"), lit("label").as("section"),
        col("name").as("item"), lit(null).cast("string").as("detail"),
        lit("linked").as("value"))
    core.unionByName(provenance).unionByName(features).unionByName(labels)
      .join(broadcast(keyById), "__art_id")
      .select("art_key", "section", "item", "detail", "value")
  }

  def artifact(cat: Catalog, artifactId: Long): String = {
    val a = cat.table("artifact").filter(col("id") === artifactId).head(2)
    require(a.nonEmpty, s"no artifact $artifactId")
    val row = a.head
    def g(n: String): String = Option(row.getAs[Any](n)).map(_.toString).getOrElse("—")

    val sb = new StringBuilder
    sb.append(s"Artifact ${g("uid")}\n")
    sb.append(s"├── key: ${g("key")}  suffix: ${g("suffix")}  kind: ${g("kind")}\n")
    sb.append(s"├── size: ${g("size")}  hash: ${g("hash")} (${g("hash_type")})\n")
    sb.append(s"├── branch: ${g("branch_id")}  is_latest: ${g("is_latest")}  version_tag: ${g("version_tag")}\n")

    Option(row.getAs[Any]("run_id")).foreach { rid =>
      val run = cat.table("run").filter(col("id") === rid).head(2)
      run.headOption.foreach { r =>
        val tr = cat.table("transform")
          .filter(col("id") === r.getAs[Long]("transform_id")).head(2)
        val key = tr.headOption.map(_.getAs[String]("key")).getOrElse("?")
        sb.append(s"├── provenance: run ${r.getAs[String]("uid")} of transform '$key' " +
          s"(status ${r.getAs[Int]("status_code")})\n")
      }
    }

    val feats = cat.table("artifact_json_values").filter(col("artifact_id") === artifactId)
      .join(cat.table("json_value")
        .select(col("id").as("json_value_id"), col("feature_id"), col("value_json")), "json_value_id")
      .join(cat.table("feature").select(col("id").as("feature_id"), col("name"), col("dtype")), "feature_id")
      .select("name", "dtype", "value_json").orderBy("name").collect()
    if (feats.nonEmpty) {
      sb.append("├── features:\n")
      feats.foreach(f => sb.append(
        s"│     ${f.getString(0)} (${Option(f.getString(1)).getOrElse("?")}): ${f.getString(2)}\n"))
    }

    val labels = cat.table("artifact_ulabels").filter(col("artifact_id") === artifactId)
      .join(cat.table("ulabel").select(col("id").as("ulabel_id"), col("name")), "ulabel_id")
      .select("name").orderBy("name").collect().map(_.getString(0))
    if (labels.nonEmpty) sb.append(s"└── labels: ${labels.mkString(", ")}\n")
    sb.toString
  }

  /** Provenance tree (`view_lineage`, `has_parents.py:254`): walk UP from
    * an artifact through its producing run to that run's input artifacts,
    * recursively. Driver-resident traversal over metadata rows with a
    * visited set (re-converging DAG nodes render once as back-references).
    */
  def viewLineage(cat: Catalog, artifactId: Long, maxDepth: Int = 10): String = {
    val sb = new StringBuilder
    val seen = scala.collection.mutable.Set.empty[Long]

    def artifactLabel(id: Long): String = {
      val r = cat.table("artifact").filter(col("id") === id).head(1).headOption
      r.map(a => s"Artifact ${a.getAs[String]("uid")} (${Option(a.getAs[String]("key")).getOrElse("?")})")
        .getOrElse(s"Artifact #$id (missing)")
    }

    def walk(id: Long, indent: String, depth: Int): Unit = {
      if (depth > maxDepth) { sb.append(s"$indent…\n"); return }
      if (seen(id)) { sb.append(s"$indent${artifactLabel(id)} [see above]\n"); return }
      seen += id
      sb.append(s"$indent${artifactLabel(id)}\n")
      val runIdOpt = cat.table("artifact").filter(col("id") === id).head(1).headOption
        .flatMap(r => Option(r.getAs[Any]("run_id")).map(_.asInstanceOf[Long]))
      runIdOpt.foreach { rid =>
        val run = cat.table("run").filter(col("id") === rid).head(1).headOption
        run.foreach { r =>
          val tkey = cat.table("transform")
            .filter(col("id") === r.getAs[Long]("transform_id"))
            .head(1).headOption.map(_.getAs[String]("key")).getOrElse("?")
          sb.append(s"$indent└─ Run ${r.getAs[String]("uid")} of '$tkey'\n")
          val inputs = cat.table("run_inputs").filter(col("run_id") === rid)
            .select("artifact_id").orderBy("artifact_id").collect().map(_.getLong(0))
          inputs.foreach(in => walk(in, indent + "   ", depth + 1))
        }
      }
    }
    walk(artifactId, "", 0)
    sb.toString
  }
}
