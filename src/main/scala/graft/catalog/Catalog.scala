package graft.catalog

import scala.collection.mutable
import scala.jdk.CollectionConverters._
import java.nio.file.{Files, Paths, StandardCopyOption}
import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.StructType
import graft.core.Base62

/** Parquet-backed metadata catalog with copy-on-write snapshots.
  *
  * Mirrors the role of the reference's SQL metadata database
  * (SQLite/Postgres behind Django, `lamindb/models/sqlrecord.py`), adapted
  * to an immutable data-lake substrate:
  *
  *  - each registry table is a directory of versioned parquet snapshots
  *    `<root>/<table>/v<N>`; `_manifest.json` points at the current version
  *    (atomic rename commit, single writer);
  *  - inserts accumulate in a driver-side buffer (the reference batches
  *    bulk saves at 10k rows, `models/save.py:31`) and are unioned into
  *    reads until flushed;
  *  - updates (trash/restore, `is_latest` flips) are whole-table
  *    copy-on-write rewrites — registry tables are metadata (small relative
  *    to the data plane), and rewrites are Spark jobs so they scale with
  *    the cluster, not the driver.
  *
  * `seed` makes uid generation and the clock deterministic, which the
  * correctness harness needs; production use passes seed=None semantics via
  * `Catalog.random`.
  */
final class Catalog(
    val spark: SparkSession,
    val root: String,
    rng: java.util.Random,
    val clock: () => Timestamp
) {
  import Catalog._

  private val buffers = mutable.Map.empty[String, mutable.ArrayBuffer[Row]]
  private val maxIds = mutable.Map.empty[String, Long]
  private val snapshotCache = mutable.Map.empty[String, DataFrame]
  private val manifest = mutable.Map.empty[String, Int] // table -> version

  /** Branch visibility context (reference: `branch_id` on SQLRecord). */
  var currentBranchId: Long = MainBranchId
  /** Spaces this catalog's caller reads BY DEFAULT (reference: Space,
    * `models/sqlrecord.py:1702`); the "all" space is always included.
    * Drives the default-visibility injection in QuerySet — a scoping
    * convenience, not the reference's non-bypassable Postgres RLS (an
    * explicit space filter or id/uid/hash addressing reads outside it).
    */
  var visibleSpaceIds: Seq[Long] = Seq(AllSpaceId)
  /** Space new records are written into when set (reference: run-context /
    * settings space, `models/sqlrecord.py:1193-1205`); None = "all" space.
    */
  var currentSpaceId: Option[Long] = None
  /** Active run for lineage auto-linking; set by Lineage.track. */
  var currentRunId: Option[Long] = None
  /** Audit identity: fills `created_by_id` on insert when set (the
    * reference's `current_user_id` default on every TracksRun model).
    */
  var currentUserId: Option[Long] = None

  locally { loadManifest() }

  def uid(n: Int): String = Base62.randomWith(n, rng)
  def newUidFor(t: TableDef): String =
    if (t.versioned) graft.core.Versioning.createUid(rng) else uid(t.uidLen)

  def tableDef(name: String): TableDef =
    Schemas.byName.getOrElse(name, throw new IllegalArgumentException(s"unknown registry '$name'"))

  // ---------------------------------------------------------------- reads

  private def snapshotDf(name: String): Option[DataFrame] =
    manifest.get(name).map { v =>
      snapshotCache.getOrElseUpdate(s"$name/v$v",
        spark.read.schema(tableDef(name).schema).parquet(s"$root/$name/v$v"))
    }

  private def bufferDf(name: String): Option[DataFrame] =
    buffers.get(name).filter(_.nonEmpty).map { rows =>
      spark.createDataFrame(rows.toList.asJava, tableDef(name).schema)
    }

  /** Current view of a registry table (snapshot ∪ unflushed buffer). */
  def table(name: String): DataFrame = {
    val t = tableDef(name)
    (snapshotDf(name), bufferDf(name)) match {
      case (Some(s), Some(b)) => s.unionByName(b)
      case (Some(s), None)    => s
      case (None, Some(b))    => b
      case (None, None)       => spark.createDataFrame(List.empty[Row].asJava, t.schema)
    }
  }

  // --------------------------------------------------------------- writes

  def nextId(name: String): Long = {
    val cur = maxIds.getOrElseUpdate(name, {
      snapshotDf(name) match {
        case Some(df) => Option(df.agg(org.apache.spark.sql.functions.max("id")).head().get(0))
          .map(_.asInstanceOf[Long]).getOrElse(0L)
        case None => 0L
      }
    })
    maxIds(name) = cur + 1
    cur + 1
  }

  /** Insert one row given by field map; fills id/uid/audit/branch defaults.
    * Returns the completed row as a Map.
    */
  def insert(name: String, values: Map[String, Any]): Map[String, Any] = {
    val t = tableDef(name)
    val withDefaults: Map[String, Any] = {
      var m = values
      if (!m.contains("id")) m += "id" -> nextId(name)
      if (t.uidLen > 0 && !m.contains("uid")) m += "uid" -> newUidFor(t)
      if (t.hasBranch && !m.contains("branch_id")) m += "branch_id" -> currentBranchId
      if (t.fieldNames.contains("space_id") && !m.contains("space_id"))
        m += "space_id" -> currentSpaceId.getOrElse(AllSpaceId)
      if (t.fieldNames.contains("is_latest") && !m.contains("is_latest")) m += "is_latest" -> true
      if (t.fieldNames.contains("created_at") && !m.contains("created_at")) m += "created_at" -> clock()
      if (t.fieldNames.contains("created_by_id") && !m.contains("created_by_id"))
        currentUserId.foreach(u => m += "created_by_id" -> u)
      m
    }
    val unknown = withDefaults.keySet -- t.fieldNames
    require(unknown.isEmpty, s"unknown fields $unknown for registry '$name'")
    val row = Row.fromSeq(t.schema.fields.map(f => withDefaults.get(f.name).orNull).toSeq)
    buffers.getOrElseUpdate(name, mutable.ArrayBuffer.empty) += row
    withDefaults
  }

  def insertAll(name: String, rows: Seq[Map[String, Any]]): Seq[Map[String, Any]] =
    rows.map(insert(name, _))

  /** Copy-on-write full-table rewrite (trash/restore, is_latest flips,
    * bulk updates). The new content replaces snapshot AND buffer.
    */
  def overwrite(name: String, df: DataFrame): Unit = {
    val t = tableDef(name)
    val aligned = df.select(t.schema.fieldNames.map(org.apache.spark.sql.functions.col).toIndexedSeq: _*)
    writeSnapshot(name, aligned)
    buffers.remove(name)
  }

  /** Persist buffered inserts of one table into a new snapshot version. */
  def flush(name: String): Unit =
    if (buffers.get(name).exists(_.nonEmpty)) { writeSnapshot(name, table(name)); buffers.remove(name) }

  def flushAll(): Unit = Schemas.all.map(_.name).foreach(flush)

  private def writeSnapshot(name: String, df: DataFrame): Unit = {
    val v = manifest.getOrElse(name, 0) + 1
    val path = s"$root/$name/v$v"
    // most registry tables are metadata-scale: one file keeps every
    // downstream catalog join broadcast-able. But a registry CAN be huge
    // (the reference claims 1e9 runs) — past ~1 GiB estimated, keep the
    // incoming partitioning instead of funnelling the rewrite through a
    // single task. The gate reads logical-plan STATS, not
    // `df.rdd.getNumPartitions`: the latter both forces physical planning
    // per flush and mis-fires on buffered local relations, whose default
    // parallelism made 500-row tables write 33 tiny files each.
    val est = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val out = if (est > (1L << 30)) df else df.coalesce(1)
    out.write.mode("overwrite").parquet(path)
    manifest(name) = v
    snapshotCache.remove(s"$name/v${v - 1}")
    saveManifest()
  }

  /** Snapshot retention: every write creates `<table>/v<N>`, so a
    * long-lived catalog accumulates dead versions. Vacuum deletes all
    * but the newest `keepLast` versions per table (never the manifest's
    * current version — readers resolve through the manifest, so removing
    * superseded snapshots is safe in this single-writer design). Returns
    * the number of snapshot directories removed.
    */
  def vacuum(keepLast: Int = 2): Int = {
    require(keepLast >= 1, "must keep at least the current version")
    var removed = 0
    manifest.foreach { case (name, current) =>
      val dir = Paths.get(root, name)
      if (Files.isDirectory(dir)) {
        val stream = Files.list(dir)
        try {
          stream.iterator().asScala.foreach { p =>
            val fn = p.getFileName.toString
            if (fn.startsWith("v") && fn.drop(1).forall(_.isDigit)) {
              val v = fn.drop(1).toInt
              if (v <= current - keepLast) {
                deleteRecursively(p)
                snapshotCache.remove(s"$name/v$v")
                removed += 1
              }
            }
          }
        } finally stream.close()
      }
    }
    removed
  }

  private def deleteRecursively(p: java.nio.file.Path): Unit = {
    if (Files.isDirectory(p)) {
      val s = Files.list(p)
      try s.iterator().asScala.foreach(deleteRecursively) finally s.close()
    }
    Files.deleteIfExists(p)
  }

  // ------------------------------------------------------------- manifest

  private def manifestPath = Paths.get(root, "_manifest.json")

  private def loadManifest(): Unit =
    if (Files.exists(manifestPath)) {
      val txt = Files.readString(manifestPath)
      """"([^"]+)"\s*:\s*(\d+)""".r.findAllMatchIn(txt).foreach { m =>
        manifest(m.group(1)) = m.group(2).toInt
      }
    }

  private def saveManifest(): Unit = {
    Files.createDirectories(Paths.get(root))
    val tmp = Paths.get(root, s"_manifest.json.tmp")
    val json = manifest.toSeq.sortBy(_._1)
      .map { case (k, v) => s""""$k": $v""" }.mkString("{", ", ", "}")
    Files.writeString(tmp, json)
    Files.move(tmp, manifestPath, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }
}

object Catalog {
  val MainBranchId = 1L
  val TrashBranchId = -1L
  val ArchiveBranchId = 0L
  /** The built-in "all" space, readable by every collaborator
    * (`models/sqlrecord.py:1702`, db_default 1 on every space FK).
    */
  val AllSpaceId = 1L

  /** Default visible branches: current + main (`query_set.py:71-90`). */
  def defaultBranchIds(current: Long): Seq[Long] =
    if (current == MainBranchId) Seq(MainBranchId) else Seq(current, MainBranchId)

  /** Deterministic catalog (fixed seed + fixed clock) for tests/verify. */
  def deterministic(spark: SparkSession, root: String, seed: Long = 42L): Catalog =
    new Catalog(spark, root, new java.util.Random(seed),
      () => new Timestamp(1700000000000L))

  def random(spark: SparkSession, root: String): Catalog =
    new Catalog(spark, root, new java.security.SecureRandom(),
      () => new Timestamp(System.currentTimeMillis()))
}
