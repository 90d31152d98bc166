package graft.artifact

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import graft.catalog.Catalog
import graft.core.{Hashing, Versioning}

/** Collections: versioned, ordered lists of artifacts
  * (`lamindb/models/collection.py:98`, link table `:741`).
  *
  * The collection hash is the order-independent digest of member hashes —
  * two collections over identical content are the same collection
  * (idempotent create, like artifacts). `append` creates a NEW VERSION of
  * the collection with one more member (`collection.py:398-425`);
  * `open`/`load` delegate to the multi-path scan / unionByName concat.
  */
final class Collections(cat: Catalog, store: ArtifactStore) {

  private def memberHashes(artifactIds: Seq[Long]): Seq[String] =
    cat.table("artifact").filter(col("id").isin(artifactIds: _*))
      .select("hash").collect().map(_.getString(0)).toSeq

  private def collectionHash(artifactIds: Seq[Long]): String =
    Hashing.md5String(memberHashes(artifactIds).sorted.mkString)

  /** Create (or idempotently return) a collection over the given
    * artifacts, preserving order via the link table's `position`.
    */
  def create(key: String, artifactIds: Seq[Long], description: String = null): Map[String, Any] = {
    val hash = collectionHash(artifactIds)
    val existing = cat.table("collection").filter(col("hash") === hash).head(1)
    if (existing.nonEmpty)
      return existing.head.schema.fieldNames.zip(existing.head.toSeq).toMap
    val family = cat.table("collection").filter(col("key") === key)
      .select("uid").collect().map(_.getString(0))
    val uid =
      if (family.nonEmpty) Versioning.nextUidInFamily(family.toIndexedSeq)
      else cat.newUidFor(cat.tableDef("collection"))
    if (family.nonEmpty) demoteHeads(Versioning.stem(uid))
    val row = cat.insert("collection", Map(
      "uid" -> uid, "key" -> key, "hash" -> hash, "description" -> description,
      "is_latest" -> true))
    val cid = row("id").asInstanceOf[Long]
    artifactIds.zipWithIndex.foreach { case (aid, pos) =>
      cat.insert("collection_artifacts",
        Map("collection_id" -> cid, "artifact_id" -> aid, "position" -> pos))
    }
    row
  }

  private def demoteHeads(stem: String): Unit = {
    cat.flush("collection")
    cat.overwrite("collection",
      cat.table("collection").withColumn("is_latest",
        when(col("uid").startsWith(stem) && col("branch_id") === cat.currentBranchId, lit(false))
          .otherwise(col("is_latest"))))
  }

  /** New version of the collection with the extra artifacts appended
    * (`Collection.append`).
    */
  def append(collectionId: Long, artifactIds: Seq[Long]): Map[String, Any] = {
    val row = cat.table("collection").filter(col("id") === collectionId).head()
    val key = row.getAs[String]("key")
    val members = orderedArtifactIds(collectionId)
    create(key, members ++ artifactIds)
  }

  /** Member artifact ids in position order (`ordered_artifacts`). */
  def orderedArtifactIds(collectionId: Long): Seq[Long] =
    cat.table("collection_artifacts").filter(col("collection_id") === collectionId)
      .orderBy("position").select("artifact_id").collect().map(_.getLong(0)).toSeq

  /** Member artifact rows (catalog DataFrame, position order retained). */
  def artifacts(collectionId: Long): DataFrame =
    cat.table("collection_artifacts").filter(col("collection_id") === collectionId)
      .select(col("artifact_id").as("id"), col("position"))
      .join(cat.table("artifact"), "id")
      .orderBy("position")

  /** One lazy multi-path scan over all members (`Collection.open`). */
  def open(collectionId: Long): DataFrame = store.open(artifacts(collectionId))

  /** Eager concat with inner/outer column alignment and per-member
    * provenance (`_load_concat_artifacts`, `collection.py:63-95`):
    * inner = intersection of columns, outer = unionByName with null fill;
    * `artifact_uid` is the provenance label column.
    */
  def load(collectionId: Long, join: String = "outer"): DataFrame = {
    val members = artifacts(collectionId)
    val rows = members.select("id", "uid").collect()
    val dfs = rows.map { r =>
      store.open(members.filter(col("id") === r.getLong(0)))
        .withColumn("artifact_uid", lit(r.getString(1)))
    }
    join match {
      case "outer" => dfs.reduce(_.unionByName(_, allowMissingColumns = true))
      case "inner" =>
        val common = dfs.map(_.columns.toSet).reduce(_ intersect _).toSeq.sorted
        dfs.map(_.select(common.map(col): _*)).reduce(_.unionByName(_))
      case other => throw new IllegalArgumentException(s"join must be inner/outer, got $other")
    }
  }

  /** Total observations = sum over members (`n_observations` property). */
  def nObservations(collectionId: Long): Long = {
    val r = artifacts(collectionId).agg(sum("n_observations")).head()
    if (r.isNullAt(0)) 0L else r.getLong(0)
  }
}
