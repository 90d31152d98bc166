package graft.artifact

import org.apache.spark.sql.functions._
import graft.catalog.Catalog
import graft.core.{Hashing, Versioning}

/** Markdown blocks (`lamindb/models/block.py`): readme-kind blocks are
  * versioned like artifacts (same `key` → same uid family), comment-kind
  * blocks are never versioned.
  *
  * Creation semantics mirror the reference constructor
  * (`block.py:100-165,261-371` + `tests/pydata/test_blocks.py`):
  *  - `kind="comment"`: always a new block; revising comments is an error;
  *  - `kind="readme"`, existing head with BLANK content: recover that head
  *    (the reference's "no content was yet saved, returning existing
  *    block", `block.py:319-329`) — the new content is not applied;
  *  - `kind="readme"`, non-blank content that hash-matches ANY visible
  *    latest block (any key, `block.py:344-360`): recover that block,
  *    keeping its original key;
  *  - otherwise: new version in the head's uid family, head flips on the
  *    current branch (blank new content over a non-blank head is a new
  *    version, not a recovery);
  *  - trashed blocks are invisible to recovery — re-creating after a soft
  *    delete starts a fresh identity.
  */
final class Blocks(cat: Catalog) {

  def create(key: String, content: String = "", kind: String = "readme",
             versionTag: Option[String] = None,
             anchorId: Option[Long] = None): Map[String, Any] = {
    require(kind == "readme" || kind == "comment", s"unsupported block kind '$kind'")
    val hash = if (content.nonEmpty) Hashing.md5String(content) else null

    def insertRow(uid: String): Map[String, Any] =
      cat.insert("block", Map(
        "uid" -> uid, "key" -> key, "content" -> content, "hash" -> hash,
        "kind" -> kind, "version_tag" -> versionTag.orNull,
        "anchor_id" -> anchorId.map(Long.box).orNull, "is_latest" -> true))

    if (kind == "comment") return insertRow(cat.newUidFor(cat.tableDef("block")))

    // readme: recovery semantics from block.py:308-360. Non-trash is the
    // reference's `~Q(branch_id=-1)` — recovery looks across branches.
    val nonTrash = cat.table("block").filter(
      col("kind") === kind && col("branch_id") =!= Catalog.TrashBranchId)
    val head = nonTrash.filter(col("key") === key && col("is_latest"))
      .head(1).headOption
    val headBlank = head.exists { r =>
      val c = r.getAs[String]("content"); c == null || c.isEmpty
    }
    if (headBlank) return head.get.schema.fieldNames.zip(head.get.toSeq).toMap
    // global content-hash dedup across ALL visible latest blocks (any key)
    if (hash != null) {
      val byHash = nonTrash.filter(col("is_latest") && col("hash") === hash)
        .head(1).headOption
      byHash.foreach { r => return r.schema.fieldNames.zip(r.toSeq).toMap }
    }
    head match {
      case Some(r) =>
        // revise: next suffix in the head's family, demote current head
        val stem = Versioning.stem(r.getAs[String]("uid"))
        val familyUids = cat.table("block")
          .filter(col("uid").startsWith(stem)).select("uid")
          .collect().map(_.getString(0)).toSeq
        val uid = Versioning.nextUidInFamily(familyUids)
        cat.flush("block")
        cat.overwrite("block",
          cat.table("block").withColumn("is_latest",
            when(col("uid").startsWith(stem) && col("branch_id") === cat.currentBranchId,
              lit(false)).otherwise(col("is_latest"))))
        insertRow(uid)
      case None => insertRow(cat.newUidFor(cat.tableDef("block")))
    }
  }

  /** Record-attached block (`RecordBlock`, `block.py:396`, generic init
    * `block.py:100-165` + `test_record_block_*`): readme-kind recovers the
    * per-(record, kind) head only when the EXISTING head's content is
    * blank; otherwise every create — including identical content — is a
    * new version (the generic init path has no hash dedup). Comments are
    * always new.
    */
  def createForRecord(recordId: Long, content: String = "", kind: String = "readme",
                      versionTag: Option[String] = None): Map[String, Any] = {
    require(kind == "readme" || kind == "comment", s"unsupported block kind '$kind'")
    val hash = if (content.nonEmpty) Hashing.md5String(content) else null

    def insertRow(uid: String): Map[String, Any] =
      cat.insert("record_block", Map(
        "uid" -> uid, "record_id" -> recordId, "content" -> content,
        "hash" -> hash, "kind" -> kind, "version_tag" -> versionTag.orNull,
        "is_latest" -> true))

    if (kind == "comment") return insertRow(cat.newUidFor(cat.tableDef("record_block")))
    val visible = cat.table("record_block").filter(
      col("record_id") === recordId && col("kind") === kind &&
        col("branch_id") =!= Catalog.TrashBranchId)
    val head = visible.filter(col("is_latest")).head(1).headOption
    head match {
      case Some(r) if { val c = r.getAs[String]("content"); c == null || c.isEmpty } =>
        // existing head never had content saved: recover it (block.py:137-146)
        r.schema.fieldNames.zip(r.toSeq).toMap
      case Some(r) =>
        val stem = Versioning.stem(r.getAs[String]("uid"))
        val familyUids = cat.table("record_block")
          .filter(col("uid").startsWith(stem)).select("uid")
          .collect().map(_.getString(0)).toSeq
        val uid = Versioning.nextUidInFamily(familyUids)
        cat.flush("record_block")
        cat.overwrite("record_block",
          cat.table("record_block").withColumn("is_latest",
            when(col("uid").startsWith(stem) && col("branch_id") === cat.currentBranchId,
              lit(false)).otherwise(col("is_latest"))))
        insertRow(uid)
      case None => insertRow(cat.newUidFor(cat.tableDef("record_block")))
    }
  }

  /** Latest visible readme content of a record (`SQLRecord.notes`,
    * `test_sqlrecord_notes_returns_latest_readme_content`).
    */
  def recordNotes(recordId: Long): Option[String] =
    cat.table("record_block").filter(
        col("record_id") === recordId && col("kind") === "readme" && col("is_latest") &&
          col("branch_id").isin(Catalog.defaultBranchIds(cat.currentBranchId): _*))
      .select("content").head(1).headOption.map(_.getString(0))

  /** Latest visible readme content for a key (`SQLRecord.notes` analog —
    * `test_sqlrecord_notes_returns_latest_readme_content`).
    */
  def latestReadme(key: String): Option[String] =
    cat.table("block").filter(
        col("key") === key && col("kind") === "readme" && col("is_latest") &&
          col("branch_id").isin(Catalog.defaultBranchIds(cat.currentBranchId): _*))
      .select("content").head(1).headOption.map(_.getString(0))

  def trash(ids: Seq[Long]): Unit = {
    cat.flush("block")
    cat.overwrite("block",
      cat.table("block")
        .withColumn("is_latest",
          when(col("id").isin(ids: _*), lit(false)).otherwise(col("is_latest")))
        .withColumn("branch_id",
          when(col("id").isin(ids: _*), lit(Catalog.TrashBranchId))
            .otherwise(col("branch_id"))))
  }
}
