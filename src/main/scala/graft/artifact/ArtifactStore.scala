package graft.artifact

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import graft.catalog.Catalog
import graft.core.{Hashing, Versioning}
import graft.query.{DoesNotExist, QuerySet}

/** Artifact lifecycle: idempotent creation, versioning, open/load,
  * trash/restore — the data-plane half of the reference
  * (`lamindb/models/artifact.py`).
  *
  * Creation follows `get_stat_or_artifact` (`artifact.py:384-505`):
  * same content hash → return the existing artifact (idempotency);
  * same key+storage with a new hash → a new version in the same uid
  * family (`revises` semantics); otherwise a fresh artifact.
  */
final class ArtifactStore(val cat: Catalog) {
  private def spark: SparkSession = cat.spark

  /** Ensure a storage root exists; return its id. */
  def ensureStorage(root: String): Long = {
    val existing = cat.table("storage").filter(col("root") === root).select("id").head(1)
    if (existing.nonEmpty) existing.head.getLong(0)
    else cat.insert("storage", Map("root" -> root, "typ" -> "local"))("id").asInstanceOf[Long]
  }

  /** Register an existing file/directory as an artifact (ingest-by-
    * reference). Idempotent on content hash; versions on key conflict.
    * Returns the artifact row as a Map.
    */
  def registerPath(path: String, key: String, storageRoot: String,
                   kind: String = "dataset", description: String = null): Map[String, Any] = {
    val storageId = ensureStorage(storageRoot)
    val (hash, hashType, nFiles, size) = Hashing.stat(path)
    val suffix = {
      val name = path.split('/').last
      val i = name.lastIndexOf('.')
      if (i >= 0) name.substring(i) else ""
    }
    createArtifact(hash, hashType, size, nFiles, key, suffix, storageId, kind, description,
      realPath = Some(path))
  }

  /** Write a DataFrame to the storage area under the auto-key
    * `.lamindb/{uid}{suffix}` and register it (reference
    * `Artifact.from_dataframe`, `artifact.py:2245-2348`).
    */
  def fromDataFrame(df: DataFrame, key: String, storageRoot: String,
                    description: String = null): Map[String, Any] =
    fromDataFrames(Seq(df -> key), storageRoot, description).head

  /** Batched `fromDataFrame`: stage every frame's write CONCURRENTLY from
    * the shared driver pool (guide §2.6 — the writes are independent
    * output jobs into disjoint staging dirs; sequentially each pays full
    * per-job driver latency while the cluster idles), then run the
    * single-writer catalog decisioning (hash dedup / versioning /
    * inserts) SEQUENTIALLY in input order so catalog ids and uid draws
    * stay deterministic. `n_observations` rides the staged write as an
    * `Observation` metric instead of a second full count job — the
    * staged write materializes every row anyway.
    */
  def fromDataFrames(items: Seq[(DataFrame, String)], storageRoot: String,
                     description: String = null): Seq[Map[String, Any]] = {
    if (items.isEmpty) return Seq.empty
    val storageId = ensureStorage(storageRoot)
    // uid draws stay on the caller thread: the catalog rng is seeded for
    // reproducible runs, and pool-order draws would interleave randomly
    val stagePaths = items.map(_ => s"$storageRoot/.staging/${cat.uid(8)}")
    val staged = graft.core.Par.results(items.zip(stagePaths).map {
      case ((df, _), stagePath) => () => {
        val ob = org.apache.spark.sql.Observation()
        df.observe(ob, count(lit(1)).as("n")).write.mode("overwrite").parquet(stagePath)
        val (hash, hashType, nFiles, size) = Hashing.stat(stagePath)
        (hash, hashType, nFiles, size, ob.get.apply("n").asInstanceOf[Long])
      }
    })
    items.zip(stagePaths).zip(staged).map {
      case (((_, key), stagePath), (hash, hashType, nFiles, size, nObs)) =>
        findByHash(hash) match {
          case Some(existing) =>
            deletePath(stagePath)
            existing
          case None =>
            val row = createArtifact(hash, hashType, size, nFiles, key, ".parquet",
              storageId, "dataset", description, nObservations = Some(nObs))
            movePath(stagePath, artifactPath(row, storageRoot))
            row
        }
    }
  }

  /** Write a MULTI-SLOT dataset (named sub-tables) as ONE managed
    * directory artifact under the auto-key `.lamindb/{uid}{suffix}/<slot>`
    * — the storage shape behind `from_anndata`/`from_mudata`
    * (`artifact.py:2374,2502`): a composite object whose components stay
    * individually scannable Parquet. Same hash-dedup / key-versioning
    * decision as `fromDataFrame`; `n_files` counts all slot files and the
    * directory hash covers every slot.
    */
  def fromSlots(slots: Seq[(String, DataFrame)], key: String, storageRoot: String,
                suffix: String, otype: String, nObservations: Option[Long] = None,
                description: String = null,
                nObsSlot: Option[String] = None): Map[String, Any] = {
    require(slots.nonEmpty, "at least one slot required")
    val storageId = ensureStorage(storageRoot)
    val stagePath = s"$storageRoot/.staging/${cat.uid(8)}"
    slots.foreach { case (slot, _) =>
      require(slot.matches("[A-Za-z0-9_.-]+"), s"bad slot name '$slot'")
    }
    // n_observations as a metric on the counting slot's OWN write job
    // (`nObsSlot`): the write materializes every obs row anyway, so a
    // separate count pass re-reads the whole merged obs plan for a number
    // the write already knows (r18 verdict ask #4 — fuse the extra pass)
    val obsCounter = nObsSlot.filter(s => slots.exists(_._1 == s))
      .map(_ -> org.apache.spark.sql.Observation())
    // Slot writes are INDEPENDENT output jobs, so they overlap from the
    // shared driver pool (guide §2.6: Spark's scheduler runs concurrent
    // jobs; FIFO back-fills the tail of one write with the next one's
    // tasks). Sequentially, an AnnData append pays sum(per-slot job
    // latency) for obs+var+X+aux+ledger — measured as the dominant cost
    // of a03 at local scale, and idle-cluster time at 100 TB where each
    // small slot occupies a sliver of the executors. Par.jobs awaits
    // ALL branches before rethrowing, so a failed slot write can never
    // leave a sibling still writing into $stagePath while the caller
    // cleans it up (r18 review: the previous in-order fail-fast Await
    // had exactly that race).
    graft.core.Par.jobs(slots.map { case (slot, df0) =>
      () => {
        val df = obsCounter match {
          case Some((s, ob)) if s == slot => df0.observe(ob, count(lit(1)).as("n"))
          case _ => df0
        }
        // small slots (obs/var metadata) collapse to one file; a huge X
        // keeps its incoming partitioning (same stats gate as catalog
        // snapshots — don't funnel a 100 TB matrix through one task)
        val est = df0.queryExecution.optimizedPlan.stats.sizeInBytes
        val out = if (est > (1L << 30)) df else df.coalesce(1)
        out.write.mode("overwrite").parquet(s"$stagePath/$slot")
      }
    }: _*)
    val nObs = obsCounter.map(_._2.get.apply("n").asInstanceOf[Long]).orElse(nObservations)
    val (hash, hashType, nFiles, size) = Hashing.stat(stagePath)
    findByHash(hash) match {
      case Some(existing) =>
        deletePath(stagePath)
        existing
      case None =>
        val row = createArtifact(hash, hashType, size, nFiles, key, suffix, storageId,
          "dataset", description, nObservations = nObs, otype = Some(otype))
        movePath(stagePath, artifactPath(row, storageRoot))
        row
    }
  }

  /** Open one named slot of a multi-slot artifact as a lazy scan. */
  def openSlot(uid: String, slot: String): DataFrame = {
    val art = cat.table("artifact").filter(col("uid") === uid)
    trackRunInputs(art)
    val paths = pathsFor(art)
    if (paths.isEmpty) throw new DoesNotExist(s"no artifact with uid $uid")
    spark.read.parquet(s"${paths.head}/$slot")
  }

  /** Slot names present in a multi-slot artifact (storage listing). */
  def listSlots(uid: String): Seq[String] = {
    val paths = pathsFor(cat.table("artifact").filter(col("uid") === uid))
    if (paths.isEmpty) throw new DoesNotExist(s"no artifact with uid $uid")
    val dir = new java.io.File(paths.head)
    Option(dir.listFiles()).toSeq.flatten.filter(_.isDirectory).map(_.getName).sorted
  }

  /** Replace the artifact's content in storage WITHOUT a new version
    * (`Artifact.replace`, `artifact.py:2809-2900`): same uid, updated
    * hash/size/counts. If the new content hash already belongs to some
    * artifact, that artifact is returned instead (idempotent, like the
    * constructor path). Only managed artifacts (no `real_path`) can be
    * replaced.
    */
  def replace(uid: String, df: DataFrame, storageRoot: String): Map[String, Any] = {
    val rows = cat.table("artifact").filter(col("uid") === uid).head(2)
    if (rows.isEmpty) throw new graft.query.DoesNotExist(s"no artifact with uid $uid")
    val current = rowToMap(rows.head)
    require(current("real_path") == null,
      "can only replace managed artifacts (ingest-by-reference content lives outside the store)")
    val stagePath = s"$storageRoot/.staging/${cat.uid(8)}"
    df.write.mode("overwrite").parquet(stagePath)
    val (hash, hashType, nFiles, size) = Hashing.stat(stagePath)
    findByHash(hash) match {
      case Some(existing) =>
        deletePath(stagePath)
        existing
      case None =>
        val finalPath = artifactPath(current, storageRoot)
        deletePath(finalPath)
        movePath(stagePath, finalPath)
        val nObs = df.count()
        cat.flush("artifact")
        cat.overwrite("artifact",
          cat.table("artifact")
            .withColumn("hash", when(col("uid") === uid, lit(hash)).otherwise(col("hash")))
            .withColumn("hash_type", when(col("uid") === uid, lit(hashType)).otherwise(col("hash_type")))
            .withColumn("size", when(col("uid") === uid, lit(size)).otherwise(col("size")))
            .withColumn("n_files", when(col("uid") === uid, lit(nFiles)).otherwise(col("n_files")))
            .withColumn("n_observations", when(col("uid") === uid, lit(nObs)).otherwise(col("n_observations"))))
        current ++ Map("hash" -> hash, "hash_type" -> hashType, "size" -> size,
          "n_files" -> nFiles, "n_observations" -> nObs)
    }
  }

  /** Register pre-stat'd content (the reference's "one network request
    * per path stat" ingest shape) through the same dedup-or-version
    * decision as registerPath.
    */
  def registerByStat(hash: String, hashType: String, size: Long, nFiles: Long,
                     key: String, suffix: String, storageId: Long,
                     kind: String = "dataset", realPath: Option[String] = None): Map[String, Any] =
    createArtifact(hash, hashType, size, nFiles, key, suffix, storageId, kind,
      description = null, realPath = realPath)

  /** One stat-ed ingest candidate for the bulk path. */
  final case class StatEntry(hash: String, hashType: String, size: Long, nFiles: Long,
                             key: String, suffix: String, realPath: Option[String] = None)

  /** Bulk hash-dedup ingest — the scalable path (reference batches bulk
    * saves at 10k, `models/save.py:29-127`). ONE anti-join against the
    * catalog per batch instead of a lookup per record:
    * in-batch duplicates collapse by hash, catalog-existing hashes are
    * dropped, survivors are buffered driver-side in one pass.
    * Returns (nNew, nDeduped).
    */
  def registerBatch(entries: Seq[StatEntry], storageId: Long,
                    kind: String = "dataset"): (Long, Long) = {
    import scala.jdk.CollectionConverters._
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("hash", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("pos", org.apache.spark.sql.types.LongType)))
    val staged = spark.createDataFrame(
      entries.zipWithIndex.map { case (e, i) => org.apache.spark.sql.Row(e.hash, i.toLong) }.asJava,
      schema)
    // in-batch dedup (first occurrence wins) + anti-join vs catalog hashes
    val firstPos = staged.groupBy("hash").agg(min("pos").as("pos"))
    val novel = firstPos
      .join(cat.table("artifact").select("hash"), Seq("hash"), "left_anti")
      .select("pos").collect().map(_.getLong(0)).toSet
    entries.zipWithIndex.foreach { case (e, i) =>
      if (novel(i.toLong))
        cat.insert("artifact", Map(
          "uid" -> cat.newUidFor(cat.tableDef("artifact")),
          "key" -> e.key, "suffix" -> e.suffix, "kind" -> kind,
          "real_path" -> e.realPath.orNull,
          "size" -> e.size, "hash" -> e.hash, "hash_type" -> e.hashType,
          "n_files" -> e.nFiles, "storage_id" -> storageId,
          "run_id" -> cat.currentRunId.map(Long.box).orNull,
          "is_latest" -> true))
    }
    (novel.size.toLong, entries.size.toLong - novel.size)
  }

  /** Per-file ingest of a directory tree (reference `Artifact.from_dir`,
    * `artifact.py:2698-2807`): one artifact per file under `path`, keys
    * maintaining the hierarchy as `folderKey/relative/path`. False
    * duplicates — distinct files whose content hashes collide — are
    * dropped keeping the first occurrence, like the reference's sanity
    * check (`artifact.py:2769-2802`; it logs and drops them before
    * save). Dropped keys are RETURNED, not logged, so callers can act.
    * Registration routes through the bulk one-anti-join `registerBatch`,
    * never a per-file catalog lookup.
    */
  final case class FromDirResult(artifacts: Seq[Map[String, Any]], droppedDuplicateKeys: Seq[String])

  def fromDir(path: String, storageRoot: String, key: Option[String] = None,
              kind: String = "dataset"): FromDirResult = {
    val fs = Hashing.fileSystem(path)
    val root = new org.apache.hadoop.fs.Path(path)
    require(fs.getFileStatus(root).isDirectory, s"$path is not a directory")
    val storageId = ensureStorage(storageRoot)
    // key=None keeps the folder's own name, like the out-of-storage
    // default `Path(folderpath.name)` in the reference
    val folderKey = key.getOrElse(root.getName)
    val files = {
      val it = fs.listFiles(root, true)
      val b = Seq.newBuilder[org.apache.hadoop.fs.FileStatus]
      while (it.hasNext) { val st = it.next(); if (st.isFile) b += st }
      b.result().sortBy(_.getPath.toUri.getPath)
    }
    val rootUri = root.toUri.getPath.stripSuffix("/")
    val entries = files.map { st =>
      val p = st.getPath
      val rel = p.toUri.getPath.stripPrefix(rootUri).stripPrefix("/")
      val name = p.getName
      val i = name.lastIndexOf('.')
      val suffix = if (i >= 0) name.substring(i) else ""
      StatEntry(Hashing.hashFile(fs, p), "md5", st.getLen, 1L,
        s"$folderKey/$rel", suffix, realPath = Some(p.toUri.getPath))
    }
    // first occurrence per hash wins; later same-hash files are dropped
    val seen = scala.collection.mutable.Set.empty[String]
    val (kept, dropped) = entries.partition(e => seen.add(e.hash))
    registerBatch(kept, storageId, kind)
    // constructor semantics: return the catalog row per kept file, which
    // is the pre-existing artifact when the hash was already registered —
    // ONE filtered collect, not a lookup per file
    val byHash = cat.table("artifact")
      .filter(col("hash").isin(kept.map(_.hash): _*))
      .collect().map(r => r.getAs[String]("hash") -> rowToMap(r)).toMap
    FromDirResult(kept.map(e => byHash(e.hash)), dropped.map(_.key))
  }

  private def findByHash(hash: String): Option[Map[String, Any]] = {
    // hash lookup bypasses branch filtering (`query_set.py:273-293`)
    val rows = cat.table("artifact").filter(col("hash") === hash).head(1)
    rows.headOption.map(rowToMap)
  }

  private def createArtifact(hash: String, hashType: String, size: Long, nFiles: Long,
                             key: String, suffix: String, storageId: Long, kind: String,
                             description: String, nObservations: Option[Long] = None,
                             realPath: Option[String] = None,
                             otype: Option[String] = None): Map[String, Any] = {
    findByHash(hash) match {
      case Some(existing) => existing // content-identical: idempotent return
      case None =>
        // same key + storage, different content → new version of that family
        val family = cat.table("artifact")
          .filter(col("key") === key && col("storage_id") === storageId)
          .select("uid", "id", "branch_id").collect()
        val (uid, isRevision) =
          if (family.nonEmpty) (Versioning.nextUidInFamily(family.map(_.getString(0)).toSeq), true)
          else (cat.newUidFor(cat.tableDef("artifact")), false)
        if (isRevision) demoteFamilyHeads(Versioning.stem(uid))
        cat.insert("artifact", Map(
          "uid" -> uid, "key" -> key, "suffix" -> suffix, "kind" -> kind,
          "otype" -> otype.orNull,
          "real_path" -> realPath.orNull,
          "description" -> description, "size" -> size, "hash" -> hash,
          "hash_type" -> hashType, "n_files" -> nFiles,
          "n_observations" -> nObservations.orNull,
          "storage_id" -> storageId,
          "run_id" -> cat.currentRunId.map(Long.box).orNull,
          "is_latest" -> true))
    }
  }

  /** Flip previous is_latest heads of a family off (within the current
    * branch) before inserting the new head.
    */
  private def demoteFamilyHeads(stem: String): Unit = {
    cat.flush("artifact")
    val t = cat.table("artifact")
    cat.overwrite("artifact",
      t.withColumn("is_latest",
        when(col("uid").startsWith(stem) && col("branch_id") === cat.currentBranchId, lit(false))
          .otherwise(col("is_latest"))))
  }

  def rowToMap(r: Row): Map[String, Any] =
    r.schema.fieldNames.zipWithIndex.map { case (n, i) => n -> r.get(i) }.toMap

  /** Physical URI: `real_path` for ingest-by-reference artifacts, else
    * `storage.root` + auto-key `.lamindb/{uid}{suffix}` — the computed
    * `coalesce(_real_key, key)` path of the reference
    * (`artifact.py:2096-2116`, `artifact_set.py:421-437`).
    */
  def artifactPath(a: Map[String, Any], storageRoot: String): String =
    Option(a.getOrElse("real_path", null)).map(_.toString)
      .getOrElse(s"$storageRoot/.lamindb/${a("uid")}${Option(a.getOrElse("suffix", null)).getOrElse("")}")

  def pathsFor(artifacts: DataFrame): Seq[String] = {
    val storages = cat.table("storage").select(col("id").as("storage_id"), col("root"))
    artifacts.join(broadcast(storages), "storage_id")
      .select(
        coalesce(col("real_path"),
          concat(col("root"), lit("/.lamindb/"), col("uid"), coalesce(col("suffix"), lit(""))))
          .as("path"))
      .collect().map(_.getString(0)).toSeq
  }

  /** Open a set of catalog-resolved artifacts as ONE lazy multi-path scan
    * (`ArtifactSet.open`, `artifact_set.py:63-82`): all members must share
    * a suffix (pre-read validation like the reference).
    * Auto-links run inputs when a run is active (`track_run_input`).
    */
  def open(artifacts: DataFrame): DataFrame = {
    val suffixes = artifacts.select("suffix").distinct().collect().map(_.getString(0))
    require(suffixes.length == 1,
      s"cannot open artifacts with mixed suffixes: ${suffixes.mkString(", ")}")
    trackRunInputs(artifacts)
    val paths = pathsFor(artifacts)
    suffixes.head match {
      case ".parquet" => spark.read.parquet(paths: _*)
      case ".csv"     => spark.read.option("header", "true").option("inferSchema", "true").csv(paths: _*)
      case ".tsv"     => spark.read.option("header", "true").option("sep", "\t").option("inferSchema", "true").csv(paths: _*)
      case ".json" | ".ndjson" => spark.read.json(paths: _*)
      case ".h5ad" =>
        // native HDF5 parse (graft.h5): X of each member as distributed
        // COO, unioned with member provenance — the multi-file analog of
        // the reference's suffix-gated AnnData open
        paths.map { p =>
          graft.h5.AnnH5.open(spark, p).x.withColumn("_source_path", lit(p))
        }.reduce(_ unionByName _)
      case ".fcs" =>
        // native FCS parse: per-member event matrix, unioned
        paths.map { p =>
          FcsReader.read(spark, p).withColumn("_source_path", lit(p))
        }.reduce(_ unionByName _)
      case ".zarr" =>
        // native zarr parse (graft.zarr, v2 + v3): same X-as-COO contract
        // as .h5ad — the reference treats the two stores as co-equal, and
        // routes stores carrying spatialdata_attrs to the SpatialData
        // accessor's tables surface (_backed_access.py:108-121)
        paths.map { p =>
          val ds =
            if (graft.zarr.SpatialZarr.isSpatial(p)) {
              val sd = graft.zarr.SpatialZarr.open(spark, p)
              sd.tables.toSeq.sortBy(_._1).headOption.map(_._2).getOrElse(
                sys.error(s"$p: spatialdata store with no tables"))
            } else graft.zarr.AnnZarr.open(spark, p)
          ds.x.withColumn("_source_path", lit(p))
        }.reduce(_ unionByName _)
      case other      => throw new IllegalArgumentException(s"unsupported suffix for open(): $other")
    }
  }

  def openByUid(uid: String): DataFrame =
    open(cat.table("artifact").filter(col("uid") === uid))

  /** Catalog row of an artifact by uid (metadata, no content open). */
  def getByUid(uid: String): Map[String, Any] = {
    val rows = cat.table("artifact").filter(col("uid") === uid).head(1)
    require(rows.nonEmpty, s"no artifact with uid $uid")
    rowToMap(rows.head)
  }

  /** Lineage side-effect: any open/load against an active run records the
    * artifacts as run inputs (`track_run_input`, `artifact.py:3783-3955`).
    */
  private def trackRunInputs(artifacts: DataFrame): Unit =
    cat.currentRunId.foreach { runId =>
      val ids = artifacts.select("id").collect().map(_.getLong(0))
      val existing = cat.table("run_inputs")
        .filter(col("run_id") === runId && col("artifact_id").isin(ids.toIndexedSeq: _*))
        .select("artifact_id").collect().map(_.getLong(0)).toSet
      ids.filterNot(existing).foreach { aid =>
        cat.insert("run_inputs", Map("run_id" -> runId, "artifact_id" -> aid))
      }
    }

  /** Path-based get (`artifacts_from_path`, `artifact_set.py:382-441`):
    * match the computed physical path — real_path for referenced
    * artifacts, root + auto-key for managed ones.
    */
  def getByPath(path: String): Map[String, Any] =
    getByPaths(Seq(path))(path)

  /** Batched path-based get: ONE catalog plan resolves EVERY path (the
    * q46 `rowsMany` shape — n sequential `head()` jobs, each a full
    * driver round-trip over metadata-sized frames, collapse into one
    * isin-filtered collect). Missing paths throw like `getByPath`;
    * results are keyed by the resolved path.
    */
  def getByPaths(paths: Seq[String]): Map[String, Map[String, Any]] = {
    if (paths.isEmpty) return Map.empty
    val storages = cat.table("storage").select(col("id").as("storage_id"), col("root"))
    val pathCol = coalesce(col("real_path"),
      concat(col("root"), lit("/.lamindb/"), col("uid"), coalesce(col("suffix"), lit(""))))
    val rows = cat.table("artifact").join(broadcast(storages), "storage_id")
      .withColumn("__path", pathCol)
      .filter(col("__path").isin(paths: _*))
      .collect()
    val byPath = rows.groupBy(_.getAs[String]("__path"))
    paths.map { p =>
      val hit = byPath.getOrElse(p, Array.empty[Row]).headOption
        .getOrElse(throw new DoesNotExist(s"no artifact at path $p"))
      p -> (rowToMap(hit) - "__path")
    }.toMap
  }

  /** Local cache copy (API parity with `artifact.cache()`,
    * `artifact.py:3194-3227`): Spark executors read remote paths
    * directly, so this is a thin Hadoop-FS copy for callers that need a
    * local file; corrupted/stale cache entries (size mismatch) re-copy.
    */
  def cache(a: Map[String, Any], storageRoot: String, cacheDir: String): String = {
    val src = artifactPath(a, storageRoot)
    val dst = s"$cacheDir/${a("uid")}${Option(a.getOrElse("suffix", null)).getOrElse("")}"
    val fs = Hashing.fileSystem(dst)
    val dstPath = new org.apache.hadoop.fs.Path(dst)
    val srcPath = new org.apache.hadoop.fs.Path(src)
    val srcFs = Hashing.fileSystem(src)
    val expected = srcFs.getContentSummary(srcPath).getLength
    val stale = !fs.exists(dstPath) || fs.getContentSummary(dstPath).getLength != expected
    if (stale) {
      fs.delete(dstPath, true)
      org.apache.hadoop.fs.FileUtil.copy(srcFs, srcPath, fs, dstPath, false, fs.getConf)
    }
    dst
  }

  /** Cross-instance transfer: upsert records into another catalog matched
    * on uid (`transfer_to_default_db`; uid-matching per
    * `query_set.py:217-242`). Returns number of newly created rows.
    *
    * Foreign-key columns are catalog-local, so they are remapped through
    * the related registry's uid in the target (the reference's
    * `update_fk_to_default_db`, `_is_versioned.py`/`transfer.py`): missing
    * parents are transferred first (recursively), then each FK id is
    * rewritten to the target catalog's id for the same uid. FKs whose
    * parent row no longer exists in the source are nulled rather than
    * carried across as dangling ids.
    */
  def transferTo(target: graft.catalog.Catalog, registry: String, uids: Seq[String]): Long =
    transferTo(target, registry, uids, Set.empty)

  private def transferTo(target: graft.catalog.Catalog, registry: String,
      uids: Seq[String], inFlight: Set[(String, String)]): Long = {
    val tdef = cat.tableDef(registry)
    // guard against FK cycles (e.g. record.type_id -> record): rows already
    // being transferred higher up the stack are skipped here; their FK in
    // the child resolves (or nulls) once the outer frame inserts them
    val wanted = uids.filterNot(u => inFlight((registry, u)))
    if (wanted.isEmpty) return 0L
    val flight = inFlight ++ wanted.map(registry -> _)
    val mine = cat.table(registry).filter(col("uid").isin(wanted: _*))
    val existing = target.table(registry).select("uid")
    val fresh = mine.join(existing, Seq("uid"), "left_anti").collect()
    if (fresh.isEmpty) return 0L

    // FK columns to remap: declared registry FKs plus the implicit audit
    // (created_by -> user) and space links. branch_id -1/0/1 are universal
    // constants; ids >= 2 are catalog-local branches (handled below).
    val fkCols: Seq[(String, String)] =
      tdef.fks.values.map(fk => fk.localCol -> fk.target).toSeq ++
        (if (tdef.fieldNames.contains("created_by_id")) Seq("created_by_id" -> "user") else Nil) ++
        (if (tdef.fieldNames.contains("space_id")) Seq("space_id" -> "space") else Nil)

    var parentCreated = 0L
    val remaps: Map[String, Map[Long, Long]] = fkCols.map { case (colName, parentReg) =>
      val srcIds = fresh.flatMap(r => Option(r.getAs[Any](colName)))
        .map(_.asInstanceOf[Long]).distinct.toIndexedSeq
      if (srcIds.isEmpty) colName -> Map.empty[Long, Long]
      else {
        val srcUidById = cat.table(parentReg).filter(col("id").isin(srcIds: _*))
          .select("id", "uid").collect()
          .map(r => r.getLong(0) -> r.getString(1)).toMap
        val parentUids = srcUidById.values.toSeq.distinct
        if (parentUids.nonEmpty)
          parentCreated += transferTo(target, parentReg, parentUids, flight)
        val tgtIdByUid = target.table(parentReg).filter(col("uid").isin(parentUids: _*))
          .select("uid", "id").collect()
          .map(r => r.getString(0) -> r.getLong(1)).toMap
        colName -> srcUidById.flatMap { case (sid, u) => tgtIdByUid.get(u).map(sid -> _) }
      }
    }.toMap

    // catalog-local branches (BranchOps creates ids >= 2): remap through
    // the branch registry's uid like any other FK; a branch that can't be
    // mapped normalizes the row onto the target's main branch rather than
    // carrying a dangling/wrong id across
    val branchRemap: Map[Long, Long] =
      if (registry == "branch" || !tdef.fieldNames.contains("branch_id")) Map.empty
      else {
        val localIds = fresh.flatMap(r => Option(r.getAs[Any]("branch_id")))
          .map(_.asInstanceOf[Long]).filter(_ >= 2L).distinct.toIndexedSeq
        if (localIds.isEmpty) Map.empty
        else {
          val srcUidById = cat.table("branch").filter(col("id").isin(localIds: _*))
            .select("id", "uid").collect()
            .map(r => r.getLong(0) -> r.getString(1)).toMap
          val branchUids = srcUidById.values.toSeq.distinct
          if (branchUids.nonEmpty)
            parentCreated += transferTo(target, "branch", branchUids, flight)
          val tgtIdByUid = target.table("branch").filter(col("uid").isin(branchUids: _*))
            .select("uid", "id").collect()
            .map(r => r.getString(0) -> r.getLong(1)).toMap
          srcUidById.flatMap { case (sid, u) => tgtIdByUid.get(u).map(sid -> _) }
        }
      }

    fresh.foreach { r =>
      var m = r.schema.fieldNames.zip(r.toSeq).toMap - "id"
      remaps.foreach { case (c, idMap) =>
        m.get(c) match {
          case Some(v: Long) => m = m.updated(c, idMap.get(v).orNull)
          case _             => ()
        }
      }
      if (registry != "branch") m.get("branch_id") match {
        case Some(v: Long) if v >= 2L =>
          m = m.updated("branch_id", branchRemap.getOrElse(v, graft.catalog.Catalog.MainBranchId))
        case _ => ()
      }
      target.insert(registry, m.filter(_._2 != null))
    }

    // M2M links travel with the record (the reference transfers schema
    // members etc. by uid — `tests/transfer`): related rows are
    // transferred first, then link rows are re-created with both sides
    // remapped; uid-conflict-free (a same-NAME local row with a different
    // uid coexists with the transferred one).
    val freshSrcIds = fresh.map(_.getAs[Long]("id")).toIndexedSeq
    val srcIdByUid2 = fresh.map(r => r.getAs[String]("uid") -> r.getAs[Long]("id")).toMap
    lazy val tgtIdByUid2 = target.table(registry)
      .filter(col("uid").isin(srcIdByUid2.keys.toSeq: _*))
      .select("uid", "id").collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    tdef.m2ms.values.foreach { m2m =>
      val links = cat.table(m2m.link).filter(col(m2m.leftCol).isin(freshSrcIds: _*)).collect()
      if (links.nonEmpty) {
        val rightIds = links.map(_.getAs[Long](m2m.rightCol)).distinct.toIndexedSeq
        val rightUidBySrc = cat.table(m2m.target).filter(col("id").isin(rightIds: _*))
          .select("id", "uid").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
        parentCreated += transferTo(target, m2m.target, rightUidBySrc.values.toSeq.distinct, flight)
        val tgtRightByUid = target.table(m2m.target)
          .filter(col("uid").isin(rightUidBySrc.values.toSeq.distinct: _*))
          .select("uid", "id").collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        val srcUidById = srcIdByUid2.map(_.swap)
        links.foreach { lr =>
          val tgtLeft = srcUidById.get(lr.getAs[Long](m2m.leftCol)).flatMap(tgtIdByUid2.get)
          val tgtRight = rightUidBySrc.get(lr.getAs[Long](m2m.rightCol)).flatMap(tgtRightByUid.get)
          (tgtLeft, tgtRight) match {
            case (Some(l), Some(rgt)) =>
              val exists = !target.table(m2m.link)
                .filter(col(m2m.leftCol) === l && col(m2m.rightCol) === rgt).isEmpty
              if (!exists) {
                val extra = lr.schema.fieldNames.zip(lr.toSeq).toMap --
                  Seq("id", m2m.leftCol, m2m.rightCol)
                target.insert(m2m.link,
                  Map(m2m.leftCol -> l, m2m.rightCol -> rgt) ++ extra.filter(_._2 != null))
              }
            case _ => () // unmappable side: drop the link, never carry raw ids
          }
        }
      }
    }
    fresh.length.toLong + parentCreated
  }

  // --------------------------------------------------- trash / restore

  /** Soft delete: move to trash branch (`branch_id = -1`) with the
    * versioned-head handoff of the reference
    * (`_adjust_is_latest_when_deleting_is_versioned`,
    * `_is_versioned.py:271-336` + `query_set.py:1312-1376`): trashed
    * heads lose `is_latest` and the most recently created remaining
    * version on the SAME branch is promoted — per (family, branch), so
    * another branch's head is never flipped. `restore` only moves back
    * to main (`sqlrecord.py:2150-2156`); the promoted successor stays
    * head.
    */
  def trash(artifactIds: Seq[Long]): Unit =
    graft.catalog.Lifecycle.trash(cat, "artifact", artifactIds)

  def restore(artifactIds: Seq[Long]): Unit =
    graft.catalog.Lifecycle.restore(cat, "artifact", artifactIds)

  /** Hard delete: remove rows and storage payloads (permanent=true path);
    * heads hand off to the newest surviving version first, like trash.
    */
  def deletePermanently(ids: Seq[Long], storageRoot: String): Unit = {
    cat.flush("artifact")
    val promote = graft.catalog.Lifecycle.successorsFor(cat, "artifact", ids)
    val doomed = cat.table("artifact").filter(col("id").isin(ids: _*))
    val paths = pathsFor(doomed)
    cat.overwrite("artifact",
      cat.table("artifact")
        .withColumn("is_latest",
          when(col("id").isin(promote: _*), lit(true)).otherwise(col("is_latest")))
        .filter(!col("id").isin(ids: _*)))
    paths.filter(_.contains("/.lamindb/")).foreach(deletePath)
  }

  private def deletePath(p: String): Unit = {
    val fs = Hashing.fileSystem(p)
    fs.delete(new org.apache.hadoop.fs.Path(p), true)
  }

  private def movePath(from: String, to: String): Unit = {
    val fs = Hashing.fileSystem(from)
    val toPath = new org.apache.hadoop.fs.Path(to)
    fs.mkdirs(toPath.getParent)
    fs.rename(new org.apache.hadoop.fs.Path(from), toPath)
  }

  def querySet: QuerySet = QuerySet(cat, "artifact")
}
