package graft.queries

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.catalog.{Catalog, Lifecycle}
import graft.query.QuerySet

/** Lifecycle driver queries: trash/restore visibility and the get()
  * uid-prefix ladder, driven through the REAL operators (a deterministic
  * in-query catalog / a versioned registry derived from `documents`), so
  * the end state is replayable by the DuckDB oracle from the base table.
  */
object LifecycleQueries {

  private def docs(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/documents.parquet")

  /** All catalog scratch dirs live under ONE per-process run root that a
    * JVM shutdown hook deletes recursively — repeated bench/verify runs
    * no longer accumulate `/tmp/graft_*` litter, and a crashed run leaves
    * at most one root to sweep.
    */
  private[queries] object TempRoot {
    private lazy val root: java.nio.file.Path = {
      val p = java.nio.file.Files.createTempDirectory("graft_run_")
      sys.addShutdownHook {
        def rm(f: java.io.File): Unit = {
          val kids = f.listFiles(); if (kids != null) kids.foreach(rm); f.delete(): Unit
        }
        rm(p.toFile)
      }
      p
    }
    def dir(prefix: String): String =
      java.nio.file.Files.createTempDirectory(root, prefix).toString
  }

  /** Serializes the cached catalog builders: `TrieMap.getOrElseUpdate` may
    * evaluate a racing builder twice, and these builders have side effects
    * (temp dirs, catalog writes) — one lock, builders are one-shot.
    */
  private val buildLock = new Object

  /** suffix of a `srcN` name as an int column */
  private def suffix(c: org.apache.spark.sql.Column) =
    substring(c, 4, 10).cast("int")

  /** One ulabel per distinct document source; sources with an even suffix
    * are trashed, then the %4==0 subset is restored — both through
    * `Lifecycle.trash/restore` (head demotion + copy-on-write overwrite),
    * not a hand-built filter. Cached per sf dir: the catalog mutates.
    */
  private val trashedCat = scala.collection.concurrent.TrieMap.empty[String, Catalog]

  private def trashRestoreCatalog(spark: SparkSession, dir: String): Catalog =
    buildLock.synchronized(trashedCat.getOrElseUpdate(dir, {
      val root = TempRoot.dir("graft_lc")
      val cat = Catalog.deterministic(spark, root)
      val sources = docs(spark, dir).select("source").distinct()
        .orderBy("source").collect().map(_.getString(0)).toSeq
      cat.insertAll("ulabel", sources.map(s => Map("name" -> s)))
      def idsWhere(p: Int => Boolean): Seq[Long] =
        sources.zipWithIndex.collect {
          case (s, i) if p(s.drop(3).toInt) => (i + 1).toLong
        }
      Lifecycle.trash(cat, "ulabel", idsWhere(_ % 2 == 0))
      Lifecycle.restore(cat, "ulabel", idsWhere(_ % 4 == 0))
      cat
    }))

  /** A versioned registry derived from documents: one family per source
    * (stem = md5 prefix), one version per lang; the alphabetically-first
    * family has every head demoted so get() exercises the fallback rung.
    *
    * Materialized ONCE per sf dir (round-14 q31 adjudication): each
    * `get()` probe runs 1–2 head() jobs over this frame, and leaving the
    * two single-partition windows in the live plan re-paid the whole
    * chain ~7× per query run — fixture cost, not get-ladder cost. Same
    * fencing as the q43 pathGet store.
    */
  private val famFix = scala.collection.concurrent.TrieMap.empty[String, DataFrame]

  private def versionedFamilies(spark: SparkSession, dir: String): DataFrame =
    buildLock.synchronized(famFix.getOrElseUpdate(dir, {
      val byFam = Window.partitionBy("source").orderBy("lang")
      val all = Window.orderBy("source", "lang")
      val fam = docs(spark, dir).select("source", "lang").distinct()
        .withColumn("rn", row_number().over(byFam))
        .withColumn("mx", count(lit(1)).over(Window.partitionBy("source")))
        .withColumn("uid", concat(substring(md5(col("source")), 1, 16),
          lpad(col("rn").cast("string"), 4, "0")))
        .withColumn("id", row_number().over(all).cast("long"))
        .withColumn("created_at", timestamp_seconds(lit(1700000000L) + col("rn")))
        .withColumn("is_latest",
          col("rn") === col("mx") &&
            col("source") =!= min(col("source")).over(Window.partitionBy(lit(1))))
      val path = TempRoot.dir("graft_fam") + "/fam.parquet"
      fam.coalesce(1).write.mode("overwrite").parquet(path)
      spark.read.parquet(path)
    }))

  /** One artifact per distinct source registered under `src/<name>`, a
    * tracked run that opens the even-suffix subset — the REAL sink,
    * open, and run-input auto-link operators end to end. Cached per sf
    * dir (artifact creation is hash-idempotent; the run is not).
    */
  private val runInputCat = scala.collection.concurrent.TrieMap.empty[String, Catalog]

  private def runInputCatalog(spark: SparkSession, dir: String): Catalog =
    buildLock.synchronized(runInputCat.getOrElseUpdate(dir, {
      val root = TempRoot.dir("graft_ri")
      val cat = Catalog.deterministic(spark, root)
      val store = new graft.artifact.ArtifactStore(cat)
      val d = docs(spark, dir)
      val sources = d.select("source").distinct()
        .orderBy("source").collect().map(_.getString(0)).toSeq
      val byKey = sources.map { s =>
        s -> store.fromDataFrame(
          d.filter(col("source") === s).select("doc_id", "n_chars"), s"src/$s", root)
      }.toMap
      val lin = new graft.lineage.Lineage(cat)
      lin.track("pipeline/open_even.scala", "val x = 1")
      byKey.collect { case (s, art) if s.drop(3).toInt % 2 == 0 =>
        store.openByUid(art("uid").toString)
      }
      lin.finish()
      cat
    }))

  /** Type-DAG catalog: one ulabel TYPE per source, parented by the
    * halving rule (srcK under src(K/2)) — a binary-ish DAG whose subtree
    * query the oracle replays with a recursive CTE.
    */
  /** q43's store of one managed artifact per source: built once per sf
    * dir — the per-source parquet writes are data preparation, the
    * operator under test is `getByPath`.
    */
  private val pathGetFix = scala.collection.concurrent.TrieMap
    .empty[String, (String, Catalog, Seq[(String, Map[String, Any])])]

  private def pathGetFixture(spark: SparkSession, dir: String)
      : (String, Catalog, Seq[(String, Map[String, Any])]) =
    buildLock.synchronized(pathGetFix.getOrElseUpdate(dir, {
      val root = TempRoot.dir("graft_pg")
      val cat = Catalog.deterministic(spark, root)
      val store = new graft.artifact.ArtifactStore(cat)
      val d = docs(spark, dir)
      val sources = d.select("source").distinct()
        .orderBy("source").collect().map(_.getString(0)).toSeq
      val arts = sources.map { s =>
        s -> store.fromDataFrame(
          d.filter(col("source") === s).select("doc_id", "n_chars"), s"src/$s", root)
      }
      (root, cat, arts)
    }))

  private val typeCat = scala.collection.concurrent.TrieMap.empty[String, Catalog]

  private def typeCatalog(spark: SparkSession, dir: String): Catalog =
    buildLock.synchronized(typeCat.getOrElseUpdate(dir, {
      val root = TempRoot.dir("graft_ty")
      val cat = Catalog.deterministic(spark, root)
      val sources = docs(spark, dir).select("source").distinct()
        .collect().map(_.getString(0)).sortBy(_.drop(3).toInt).toSeq
      sources.zipWithIndex.foreach { case (s, k) =>
        val base = Map[String, Any]("name" -> s, "is_type" -> true)
        cat.insert("ulabel",
          if (k == 0) base else base + ("type_id" -> (k / 2 + 1).toLong))
      }
      cat
    }))

  /** q46's described catalog: one artifact per source shard created
    * UNDER a tracked run (provenance), annotated with feature values
    * (n_docs / sum_chars — closed forms the oracle replays per source)
    * and with one ulabel per distinct shard lang, all through the real
    * ArtifactFeatures / label-manager APIs.
    */
  private val describeCat = scala.collection.concurrent.TrieMap
    .empty[String, (Catalog, Seq[(String, Long)])]

  private def describeCatalog(spark: SparkSession, dir: String): (Catalog, Seq[(String, Long)]) =
    buildLock.synchronized(describeCat.getOrElseUpdate(dir, {
      val root = TempRoot.dir("graft_desc")
      val cat = Catalog.deterministic(spark, root)
      val store = new graft.artifact.ArtifactStore(cat)
      val feats = new graft.eav.ArtifactFeatures(cat)
      val lin = new graft.lineage.Lineage(cat)
      val d = docs(spark, dir)
      val sources = d.select("source").distinct()
        .collect().map(_.getString(0)).sortBy(_.drop(3).toInt).toSeq
      val langIds = d.select("lang").distinct().collect().map(_.getString(0)).sorted
        .map(l => l -> cat.insert("ulabel", Map("name" -> l))("id").asInstanceOf[Long])
        .toMap
      lin.track("pipeline/describe.scala", "val described = true")
      val arts = sources.map { s =>
        val shard = d.filter(col("source") === s)
        val art = store.fromDataFrame(
          shard.select("doc_id", "lang", "n_chars"), s"src/$s", root)
        val id = art("id").asInstanceOf[Long]
        val agg = shard.agg(count(lit(1)), sum(col("n_chars").cast("long"))).head()
        feats.addValues(id, Map(
          "n_docs" -> agg.getLong(0), "sum_chars" -> agg.getLong(1)))
        val langs = shard.select("lang").distinct().collect().map(_.getString(0))
        feats.addLabels(id, langs.toSeq.sorted.map(langIds))
        s -> id
      }
      lin.finish()
      (cat, arts)
    }))

  /** q48's catalog: the pathGet store (one artifact per source) with the
    * label-manager mutation sequence applied once — per-shard lang labels
    * via `labels.add`, an `labels.remove` on src0's `en` link, and a
    * fresh aggregate artifact labeled purely through `labels.add_from`
    * (copied twice; the second copy must be a 0-link no-op). Every end
    * state is a closed form over `documents` the oracle replays.
    */
  private val labelCat = scala.collection.concurrent.TrieMap.empty[String, Catalog]

  private def labelCatalog(spark: SparkSession, dir: String): Catalog =
    buildLock.synchronized(labelCat.getOrElseUpdate(dir, {
      val (root, cat, arts) = pathGetFixture(spark, dir)
      val store = new graft.artifact.ArtifactStore(cat)
      val feats = new graft.eav.ArtifactFeatures(cat)
      val d = docs(spark, dir)
      val langIds = d.select("lang").distinct().collect().map(_.getString(0)).sorted
        .map(l => l -> cat.insert("ulabel", Map("name" -> l))("id").asInstanceOf[Long])
        .toMap
      val shardLangs = d.select("source", "lang").distinct().collect()
        .map(r => (r.getString(0), r.getString(1)))
        .groupBy(_._1).map { case (s, ps) => s -> ps.map(_._2).sorted.toSeq }
      val ids = arts.map { case (s, a) => s -> a("id").asInstanceOf[Long] }.toMap
      arts.foreach { case (s, a) =>
        feats.addLabels(a("id").asInstanceOf[Long], shardLangs(s).map(langIds))
      }
      feats.removeLabels(ids("src0"), langIds.get("en").toSeq)
      val agg = store.fromDataFrame(
        d.filter(col("doc_id") < 5).select("doc_id", "n_chars"), "agg/all", root)
      val aggId = agg("id").asInstanceOf[Long]
      val copied = feats.addLabelsFrom(aggId, ids("src0"))
      require(copied > 0, "add_from must copy src0's surviving links")
      require(feats.addLabelsFrom(aggId, ids("src0")) == 0L,
        "add_from must be idempotent on existing links")
      cat
    }))

  /** q49's catalog: a versioned transform registry — one family per
    * source (12-char md5 stem), one version per lang — whose even-suffix
    * HEADS are trashed through `Lifecycle.trash`: the head is demoted to
    * the trash branch and the newest surviving same-branch version is
    * promoted (`_is_versioned.py` handoff), all replayable closed-form.
    */
  private val handoffCat = scala.collection.concurrent.TrieMap.empty[String, Catalog]

  private def handoffCatalog(spark: SparkSession, dir: String): Catalog =
    buildLock.synchronized(handoffCat.getOrElseUpdate(dir, {
      val root = TempRoot.dir("graft_ho")
      val cat = Catalog.deterministic(spark, root)
      val fams = docs(spark, dir).select("source", "lang").distinct().collect()
        .map(r => (r.getString(0), r.getString(1)))
        .groupBy(_._1).toSeq.sortBy(_._1)
        .map { case (s, ps) => s -> ps.map(_._2).sorted.toSeq }
      val doomedHeads = scala.collection.mutable.ArrayBuffer.empty[Long]
      fams.foreach { case (s, langs) =>
        val stem = graft.core.Hashing.md5String(s).take(12)
        langs.zipWithIndex.foreach { case (_, i) =>
          val rn = i + 1
          val id = cat.insert("transform", Map(
            "uid" -> f"$stem$rn%04d", "key" -> s,
            "is_latest" -> (rn == langs.length),
            "created_at" -> new java.sql.Timestamp((1700000000L + rn) * 1000L)
          ))("id").asInstanceOf[Long]
          if (rn == langs.length && s.drop(3).toInt % 2 == 0) doomedHeads += id
        }
      }
      Lifecycle.trash(cat, "transform", doomedHeads.toSeq)
      cat
    }))

  /** q50's catalog: one run per source under a single transform, status
    * cycling through the reference's six status names by source suffix;
    * the run's params_json carries the source so the oracle can name the
    * matching rows without relying on generated uids.
    */
  private val runStatusCat = scala.collection.concurrent.TrieMap.empty[String, Catalog]

  private def runStatusCatalog(spark: SparkSession, dir: String): Catalog =
    buildLock.synchronized(runStatusCat.getOrElseUpdate(dir, {
      val root = TempRoot.dir("graft_rs")
      val cat = Catalog.deterministic(spark, root)
      val tid = cat.insert("transform", Map("key" -> "pipeline/status"))("id")
        .asInstanceOf[Long]
      val codes = Seq(-3, -2, -1, 0, 1, 2) // scheduled..aborted, enumMaps order
      val sources = docs(spark, dir).select("source").distinct()
        .collect().map(_.getString(0)).sortBy(_.drop(3).toInt).toSeq
      sources.foreach { s =>
        cat.insert("run", Map("transform_id" -> tid,
          "status_code" -> codes(s.drop(3).toInt % 6), "params_json" -> s))
      }
      cat
    }))

  /** q51's collections: the pathGet artifacts grouped by source-suffix
    * parity into two collections; `n_observations` must total the member
    * artifacts' observation counts.
    */
  private val nObsCollections = scala.collection.concurrent.TrieMap
    .empty[String, Seq[(String, Long)]]

  private def nObsFixture(spark: SparkSession, dir: String): Seq[(String, Long)] =
    buildLock.synchronized(nObsCollections.getOrElseUpdate(dir, {
      val (_, cat, arts) = pathGetFixture(spark, dir)
      val store = new graft.artifact.ArtifactStore(cat)
      val colls = new graft.artifact.Collections(cat, store)
      def grp(parity: Int): Seq[Long] = arts.collect {
        case (s, a) if s.drop(3).toInt % 2 == parity => a("id").asInstanceOf[Long]
      }
      Seq("grp/even" -> 0, "grp/odd" -> 1).map { case (key, parity) =>
        val c = colls.create(key, grp(parity))
        key -> colls.nObservations(c("id").asInstanceOf[Long])
      }
    }))

  /** q52's replaced artifact: created over the `de` subset, then
    * `replace`d (same uid, staged write + hash/size/count refresh) with
    * the `es` subset — the reopen must serve the NEW content under the
    * OLD identity.
    */
  private val replaceCat = scala.collection.concurrent.TrieMap
    .empty[String, (Catalog, String)]

  private def replaceFixture(spark: SparkSession, dir: String): (Catalog, String) =
    buildLock.synchronized(replaceCat.getOrElseUpdate(dir, {
      val root = TempRoot.dir("graft_rep")
      val cat = Catalog.deterministic(spark, root)
      val store = new graft.artifact.ArtifactStore(cat)
      val d = docs(spark, dir)
      val art = store.fromDataFrame(
        d.filter(col("lang") === "de").select("doc_id", "source", "n_chars"),
        "rep/doc", root)
      val rep = store.replace(art("uid").toString,
        d.filter(col("lang") === "es").select("doc_id", "source", "n_chars"), root)
      require(rep("uid") == art("uid") && rep("id") == art("id"),
        "replace must keep the artifact identity")
      (cat, art("uid").toString)
    }))

  /** q53's block table: one readme per source (revised to v2 for even
    * suffixes — head flips within the uid family) plus one comment per
    * source (never versioned). uids are generated, so the query projects
    * the closed-form columns only.
    */
  /** q54's catalog: a versioned transform registry split across two
    * branches — every family has its versions 1..mx on main; even-suffix
    * families carry one NEWER version (mx+1) on a `feature` branch — then
    * `BranchOps.merge(feature → main)`: rows move to main, `is_latest`
    * reconciles per uid family (newest created_at wins, the old main head
    * is demoted), and the source branch is marked `merged`
    * (`_is_versioned.py:338` + `setup/_merge.py`).
    */
  private val mergeCat = scala.collection.concurrent.TrieMap.empty[String, Catalog]

  private def mergeCatalog(spark: SparkSession, dir: String): Catalog =
    buildLock.synchronized(mergeCat.getOrElseUpdate(dir, {
      val root = TempRoot.dir("graft_mg")
      val cat = Catalog.deterministic(spark, root)
      cat.insert("branch", Map("name" -> "main", "status_code" -> 0))
      val featId = cat.insert("branch", Map("name" -> "feature", "status_code" -> 1))("id")
        .asInstanceOf[Long]
      val fams = docs(spark, dir).select("source", "lang").distinct().collect()
        .map(r => (r.getString(0), r.getString(1)))
        .groupBy(_._1).toSeq.sortBy(_._1)
        .map { case (s, ps) => s -> ps.map(_._2).sorted.toSeq }
      fams.foreach { case (s, langs) =>
        val stem = graft.core.Hashing.md5String(s).take(16)
        def ins(rn: Int, head: Boolean, branch: Long): Unit =
          cat.insert("transform", Map(
            "uid" -> f"$stem$rn%04d", "key" -> s,
            "is_latest" -> head, "branch_id" -> branch,
            "created_at" -> new java.sql.Timestamp((1700000000L + rn) * 1000L)
          )): Unit
        langs.indices.foreach(i => ins(i + 1, i + 1 == langs.length, 1L))
        if (s.drop(3).toInt % 2 == 0) ins(langs.length + 1, head = true, featId)
      }
      graft.catalog.BranchOps.merge(cat, "feature", Some("main"))
      val merged = cat.table("branch").filter(col("name") === "feature")
        .head().getAs[Int]("status_code")
      require(merged == graft.catalog.BranchOps.StatusMerged,
        "merge must mark the source branch merged")
      cat
    }))

  private val blocksCat = scala.collection.concurrent.TrieMap.empty[String, Catalog]

  private def blocksCatalog(spark: SparkSession, dir: String): Catalog =
    buildLock.synchronized(blocksCat.getOrElseUpdate(dir, {
      val root = TempRoot.dir("graft_blk")
      val cat = Catalog.deterministic(spark, root)
      val blocks = new graft.artifact.Blocks(cat)
      val sources = docs(spark, dir).select("source").distinct()
        .collect().map(_.getString(0)).sortBy(_.drop(3).toInt).toSeq
      sources.foreach { s => blocks.create(s"notes/$s", s"v1 $s"): Unit }
      sources.filter(_.drop(3).toInt % 2 == 0).foreach { s =>
        blocks.create(s"notes/$s", s"v2 $s"): Unit
      }
      sources.foreach { s => blocks.create(s"notes/$s", s"c $s", kind = "comment"): Unit }
      cat
    }))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "q52_replace" -> ((spark, dir) => {
      // same-uid content swap: reopening the replaced artifact serves the
      // es subset under the original identity
      val (cat, uid) = replaceFixture(spark, dir)
      val store = new graft.artifact.ArtifactStore(cat)
      store.openByUid(uid)
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars").cast("long")).as("sum_chars"))
        .orderBy("source")
    }),

    "q53_blocks" -> ((spark, dir) => {
      // block lifecycle end state: revised readmes flip heads inside the
      // uid family; comments are unversioned one-offs
      val cat = blocksCatalog(spark, dir)
      cat.table("block")
        .select(col("key"), col("kind"), col("content"), col("is_latest"))
        .orderBy("key", "kind", "content")
    }),

    "q54_branch_merge" -> ((spark, dir) => {
      // branch-merge end state: every row lands on main; within each uid
      // family the newest created_at head survives reconcile (the feature
      // branch's extra version demotes the old main head on even-suffix
      // families); the feature branch itself is require()d merged
      val cat = mergeCatalog(spark, dir)
      cat.table("transform")
        .select(col("key"), col("uid"), col("is_latest"), col("branch_id"))
        .orderBy("uid")
    }),

    "q48_label_manager" -> ((spark, dir) => {
      // label-manager end state: per-shard lang links, src0 minus the
      // removed `en`, and the add_from copy on the aggregate artifact
      val cat = labelCatalog(spark, dir)
      cat.table("artifact_ulabels")
        .join(cat.table("ulabel")
          .select(col("id").as("ulabel_id"), col("name").as("label")), "ulabel_id")
        .join(cat.table("artifact")
          .select(col("id").as("artifact_id"), col("key").as("art_key")), "artifact_id")
        .select("art_key", "label")
        .orderBy("art_key", "label")
    }),

    "q49_head_handoff" -> ((spark, dir) => {
      // versioned-head handoff on trash: even-suffix family heads land on
      // the trash branch with is_latest=false; the newest surviving
      // version is promoted to head
      val cat = handoffCatalog(spark, dir)
      cat.table("transform")
        .select(col("key"), col("uid"), col("is_latest"), col("branch_id"))
        .orderBy("uid")
    }),

    "q50_run_status" -> ((spark, dir) => {
      // status name→code filter: the `status` alias routes to status_code
      // and each name maps through TableDef.enumMaps before compilation
      val cat = runStatusCatalog(spark, dir)
      QuerySet(cat, "run")
        .filter("status__in" -> Seq("completed", "errored"))
        .df.select(col("params_json").as("source"), col("status_code"))
        .orderBy("source")
    }),

    "q51_n_observations" -> ((spark, dir) => {
      // collection n_observations: totals over member artifacts
      import spark.implicits._
      nObsFixture(spark, dir).toDF("key", "n_obs").orderBy("key")
    }),


    "q46_describe" -> ((spark, dir) => {
      // artifact.describe() as structured tree rows (Describe.rows), one
      // block per source-shard artifact; store-dependent items (uid,
      // size, hash, branch) are projected out so DuckDB can replay the
      // remaining tree from the base table alone
      // ONE batched plan for all shards (Describe.rowsMany): the per-id
      // rows() unioned 5 ways planned 584 physical operators and scanned
      // every catalog table 5x — planning dominated the wall (r18,
      // plans/r18/q46_describe_before.txt); row set is identical
      val (cat, arts) = describeCatalog(spark, dir)
      graft.lineage.Describe
        .rowsMany(cat, arts.map { case (s, id) => (s"src/$s", id) })
        .filter(!col("item").isin("uid", "size", "hash", "branch"))
        .orderBy("art_key", "section", "item", "value")
    }),

    "q39_field_aliasing" -> ((spark, dir) => {
      // alias map routes `language` to the physical `lang` column through
      // the same rewrite that serves version/transform/status aliases
      QuerySet.over(docs(spark, dir), "documents", pk = "doc_id",
          aliases = Map("language" -> "lang"))
        .filter("language__in" -> Seq("en", "fr"))
        .orderBy("doc_id").df
        .select("doc_id", "lang")
    }),

    "q40_type_subtree" -> ((spark, dir) => {
      // all types transitively under src2 (id 3) in the halving DAG;
      // traversal crosses only visible rows, start excluded
      val cat = typeCatalog(spark, dir)
      graft.query.TypeOps.instancesUnder(cat, "ulabel", 3L)
        .select("name").orderBy("name")
    }),

    "q33_artifact_roundtrip" -> ((spark, dir) => {
      // sink -> open round-trip: write the en subset as a managed
      // artifact (hash-idempotent across re-runs), reopen it as a lazy
      // scan, aggregate — data equality pinned against the base table
      val root = TempRoot.dir("graft_rt")
      val cat = Catalog.deterministic(spark, root)
      val store = new graft.artifact.ArtifactStore(cat)
      val en = docs(spark, dir).filter(col("lang") === "en")
        .select("doc_id", "source", "n_chars")
      val art = store.fromDataFrame(en, "corpus/en", root)
      store.openByUid(art("uid").toString)
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars").cast("long")).as("sum_chars"))
        .orderBy("source")
    }),

    "q34_to_dataframe_trunc" -> ((spark, dir) => {
      // default to_dataframe subset semantics: limit 20, default -pk
      // order, truncation probed on n+1 ids, order preserved positionally
      val qs = QuerySet.over(docs(spark, dir), "documents", pk = "doc_id")
        .filter("lang" -> "en")
      val (df, truncated) = qs.toDataFrame(defaultOrder = Some("-doc_id"))
      df.select(col("doc_id"), col("lang"), lit(truncated).as("is_truncated"))
    }),

    "q35_run_inputs" -> ((spark, dir) => {
      // run-input auto-link: opening an artifact under a tracked run
      // inserts a (run, artifact) link exactly once
      val cat = runInputCatalog(spark, dir)
      cat.table("run_inputs")
        .join(cat.table("artifact").select(col("id").as("artifact_id"), col("key")), "artifact_id")
        .select(col("key"), col("run_id"))
        .orderBy("key")
    }),

    "q38_collection_append" -> ((spark, dir) => {
      // collection growth: create over the first two source shards, then
      // append the third — a NEW collection version (old head demoted) —
      // and open the grown collection as one provenance-tagged scan
      val root = TempRoot.dir("graft_coll")
      val cat = Catalog.deterministic(spark, root)
      val store = new graft.artifact.ArtifactStore(cat)
      val colls = new graft.artifact.Collections(cat, store)
      val d = docs(spark, dir)
      // all three shard writes staged concurrently (fromDataFrames pools
      // the independent output jobs; catalog registration stays ordered) —
      // the collection create/append still sees src0/src1 before src2
      def shardDf(s: String) = d.filter(col("source") === s)
        .select("doc_id", "source", "n_chars")
      val shardArts = store.fromDataFrames(
        Seq(shardDf("src0") -> "shard/src0", shardDf("src1") -> "shard/src1",
          shardDf("src2") -> "shard/src2"), root)
        .map(_("id").asInstanceOf[Long])
      val v1 = colls.create("corpus/shards", shardArts.take(2))
      val v2 = colls.append(v1("id").asInstanceOf[Long], Seq(shardArts(2)))
      require(v2("uid") != v1("uid"), "append must version the collection")
      colls.open(v2("id").asInstanceOf[Long])
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars").cast("long")).as("sum_chars"))
        .orderBy("source")
    }),

    "q41_cache_stale" -> ((spark, dir) => {
      // cache → corrupt → re-cache: the staleness check (content-summary
      // size mismatch) must re-copy, and the re-read cached copy must
      // equal the base subset. Drives the REAL ArtifactStore.cache twice.
      val root = TempRoot.dir("graft_cache")
      val cacheDir = TempRoot.dir("graft_cache_local")
      val cat = Catalog.deterministic(spark, root)
      val store = new graft.artifact.ArtifactStore(cat)
      val fr = docs(spark, dir).filter(col("lang") === "fr")
        .select("doc_id", "source", "n_chars")
      val art = store.fromDataFrame(fr, "corpus/fr", root)
      val cached = store.cache(art, root, cacheDir)
      // corrupt the local copy: drop one data file (nonzero length), so
      // the summary no longer matches the source
      val part = new java.io.File(cached).listFiles()
        .filter(f => f.getName.startsWith("part-") && f.length() > 0).head
      require(part.delete(), "corruption setup failed")
      val recached = store.cache(art, root, cacheDir)
      require(recached == cached, "cache path must be stable")
      spark.read.parquet(recached)
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars").cast("long")).as("sum_chars"))
        .orderBy("source")
    }),

    "q42_transfer_remap" -> ((spark, dir) => {
      // cross-instance transfer with FK uid-remap: children (one ulabel
      // per source, typed by a parent ulabel via type_id) transfer into a
      // target catalog whose id space is SHIFTED by a decoy row — the
      // remap must resolve parents by uid, never by carried-over id
      val src = Catalog.deterministic(spark, TempRoot.dir("graft_tf_src"))
      val tgt = Catalog.deterministic(spark, TempRoot.dir("graft_tf_tgt"))
      val sources = docs(spark, dir).select("source").distinct()
        .orderBy("source").collect().map(_.getString(0)).toSeq
      val parentIds = (0 until 3).map { k =>
        k -> src.insert("ulabel", Map("name" -> s"type_$k", "is_type" -> true))("id")
          .asInstanceOf[Long]
      }.toMap
      val childUids = sources.map { s =>
        src.insert("ulabel", Map("name" -> s,
          "type_id" -> parentIds(s.drop(3).toInt % 3)))("uid").toString
      }
      // shift the target id space; the uid is EXPLICIT because both
      // catalogs are deterministic and would otherwise mint the decoy the
      // same uid as the source's first parent, making it "already
      // transferred" (uid is the cross-instance identity — the point of
      // this query)
      tgt.insert("ulabel", Map("name" -> "decoy", "uid" -> "zzdecoy0"))
      val srcStore = new graft.artifact.ArtifactStore(src)
      srcStore.transferTo(tgt, "ulabel", childUids)
      val t = tgt.table("ulabel")
      val children = t.filter(col("name").startsWith("src"))
      val parents = t.select(col("id").as("type_id"), col("name").as("type_name"))
      // the decoy forces target ids to differ from source ids for every
      // transferred row: a carried-over id would join to the wrong parent
      children.join(parents, "type_id")
        .select("name", "type_name")
        .orderBy("name")
    }),

    "q43_path_get" -> ((spark, dir) => {
      // path-based get: one managed artifact per source; the physical
      // `.lamindb/{uid}{suffix}` path of each even-suffix source must
      // resolve back to its own catalog row. The 20-artifact store is a
      // FIXTURE (built once per sf dir, like the trash/run-input
      // catalogs); the measured operator is the path→row resolution.
      val (root, cat, arts) = pathGetFixture(spark, dir)
      val store = new graft.artifact.ArtifactStore(cat)
      // ONE batched resolution plan for all even-suffix paths instead of
      // a sequential per-path head() job (r18 verdict ask #5: q43 ran 46
      // driver jobs totalling 0.11 s of task time in 1.13 s of wall)
      val wanted = arts.collect { case (s, a) if s.drop(3).toInt % 2 == 0 =>
        (s, a, s"$root/.lamindb/${a("uid")}${a("suffix")}")
      }
      val byPaths = store.getByPaths(wanted.map(_._3))
      val resolvedKeys = wanted.map { case (s, a, p) =>
        val byPath = byPaths(p)
        require(byPath("id") == a("id"), s"path get resolved the wrong artifact for $s")
        (byPath("key").toString, byPath("n_observations").asInstanceOf[Long])
      }
      import spark.implicits._
      resolvedKeys.toDF("key", "n_obs").orderBy("key")
    }),

    "q30_trash_restore" -> ((spark, dir) => {
      val cat = trashRestoreCatalog(spark, dir)
      QuerySet(cat, "ulabel").orderBy("name").df.select("name", "branch_id")
    }),

    "q31_get_ladder" -> ((spark, dir) => {
      val fam = versionedFamilies(spark, dir)
      val qs = QuerySet.over(fam, "transform", uidLen = 20, versioned = true)
      val firstThree = fam.select("source").distinct().orderBy("source")
        .limit(3).collect().map(_.getString(0)).toSeq
      // resolve each family by an 8-char uid prefix: the is_latest rung for
      // healthy families, the -created_at fallback for the demoted one
      val rows = firstThree.map { s =>
        val digest = java.security.MessageDigest.getInstance("MD5")
          .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
        qs.get(digest.take(8))
      }
      import scala.jdk.CollectionConverters._
      spark.createDataFrame(rows.asJava, fam.schema)
        .select("source", "uid", "is_latest").orderBy("source")
    })
  )

  val oracle: Map[String, String] = Map(

    "q52_replace" ->
      """SELECT source, count(*) AS n_docs,
        |       CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM documents WHERE lang = 'es'
        |GROUP BY source ORDER BY source""".stripMargin,

    "q53_blocks" ->
      """WITH s AS (SELECT source, CAST(SUBSTRING(source, 4) AS INT) % 2 = 0 AS ev
        |           FROM (SELECT DISTINCT source FROM documents)),
        |r AS (
        |  SELECT 'notes/' || source AS key, 'readme' AS kind,
        |         'v1 ' || source AS content, NOT ev AS is_latest FROM s
        |  UNION ALL
        |  SELECT 'notes/' || source, 'readme', 'v2 ' || source, TRUE FROM s WHERE ev
        |  UNION ALL
        |  SELECT 'notes/' || source, 'comment', 'c ' || source, TRUE FROM s)
        |SELECT key, kind, content, is_latest FROM r
        |ORDER BY key, kind, content""".stripMargin,

    "q54_branch_merge" ->
      """WITH fam AS (SELECT DISTINCT source, lang FROM documents),
        |v AS (SELECT source,
        |        row_number() OVER (PARTITION BY source ORDER BY lang) AS rn,
        |        count(*) OVER (PARTITION BY source) AS mx
        |      FROM fam),
        |ext AS (
        |  SELECT source, rn, mx FROM v
        |  UNION ALL
        |  SELECT source, mx + 1 AS rn, mx
        |  FROM (SELECT DISTINCT source, mx FROM v)
        |  WHERE CAST(SUBSTRING(source, 4) AS INT) % 2 = 0),
        |t AS (SELECT source,
        |        concat(substr(md5(source), 1, 16),
        |               lpad(CAST(rn AS VARCHAR), 4, '0')) AS uid,
        |        rn, mx,
        |        CAST(SUBSTRING(source, 4) AS INT) % 2 = 0 AS ev
        |      FROM ext)
        |SELECT source AS key, uid,
        |       CASE WHEN ev THEN rn = mx + 1 ELSE rn = mx END AS is_latest,
        |       CAST(1 AS BIGINT) AS branch_id
        |FROM t ORDER BY uid""".stripMargin,

    "q48_label_manager" ->
      """WITH langs AS (SELECT DISTINCT source, lang FROM documents),
        |base AS (
        |  SELECT source, lang FROM langs
        |  WHERE NOT (source = 'src0' AND lang = 'en')),
        |final AS (
        |  SELECT 'src/' || source AS art_key, lang FROM base
        |  UNION ALL
        |  SELECT 'agg/all', lang FROM base WHERE source = 'src0')
        |SELECT art_key, lang AS label FROM final
        |ORDER BY art_key, label""".stripMargin,

    "q49_head_handoff" ->
      """WITH fam AS (SELECT DISTINCT source, lang FROM documents),
        |v AS (SELECT source,
        |        row_number() OVER (PARTITION BY source ORDER BY lang) AS rn,
        |        count(*) OVER (PARTITION BY source) AS mx
        |      FROM fam),
        |t AS (SELECT source,
        |        concat(substr(md5(source), 1, 12),
        |               lpad(CAST(rn AS VARCHAR), 4, '0')) AS uid,
        |        rn, mx,
        |        CAST(SUBSTRING(source, 4) AS INT) % 2 = 0 AS ev
        |      FROM v)
        |SELECT source AS key, uid,
        |       CASE WHEN ev AND rn = mx THEN FALSE
        |            WHEN ev AND rn = mx - 1 THEN TRUE
        |            ELSE rn = mx END AS is_latest,
        |       CAST(CASE WHEN ev AND rn = mx THEN -1 ELSE 1 END AS BIGINT) AS branch_id
        |FROM t ORDER BY uid""".stripMargin,

    "q50_run_status" ->
      """SELECT source,
        |       CAST(CASE CAST(SUBSTRING(source, 4) AS INT) % 6
        |            WHEN 3 THEN 0 ELSE 1 END AS INT) AS status_code
        |FROM (SELECT DISTINCT source FROM documents)
        |WHERE CAST(SUBSTRING(source, 4) AS INT) % 6 IN (3, 4)
        |ORDER BY source""".stripMargin,

    "q51_n_observations" ->
      """SELECT 'grp/' || CASE WHEN CAST(SUBSTRING(source, 4) AS INT) % 2 = 0
        |                      THEN 'even' ELSE 'odd' END AS key,
        |       CAST(count(*) AS BIGINT) AS n_obs
        |FROM documents GROUP BY 1 ORDER BY key""".stripMargin,

    "q46_describe" ->
      """WITH per_src AS (
        |  SELECT source, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS sum_chars
        |  FROM documents GROUP BY source),
        |tree AS (
        |  SELECT 'src/' || source AS art_key, 'core' AS section, 'key' AS item,
        |         CAST(NULL AS VARCHAR) AS detail, 'src/' || source AS value FROM per_src
        |  UNION ALL SELECT 'src/' || source, 'core', 'suffix', NULL, '.parquet' FROM per_src
        |  UNION ALL SELECT 'src/' || source, 'core', 'kind', NULL, 'dataset' FROM per_src
        |  UNION ALL SELECT 'src/' || source, 'core', 'is_latest', NULL, 'true' FROM per_src
        |  UNION ALL SELECT 'src/' || source, 'provenance', 'run',
        |                   'pipeline/describe.scala', '0' FROM per_src
        |  UNION ALL SELECT 'src/' || source, 'feature', 'n_docs', 'int',
        |                   CAST(n_docs AS VARCHAR) FROM per_src
        |  UNION ALL SELECT 'src/' || source, 'feature', 'sum_chars', 'int',
        |                   CAST(sum_chars AS VARCHAR) FROM per_src
        |  UNION ALL SELECT DISTINCT 'src/' || source, 'label', lang, NULL, 'linked'
        |            FROM documents)
        |SELECT art_key, section, item, detail, value FROM tree
        |ORDER BY art_key, section, item, value""".stripMargin,

    "q39_field_aliasing" ->
      """SELECT doc_id, lang FROM documents
        |WHERE lang IN ('en', 'fr') ORDER BY doc_id""".stripMargin,

    "q40_type_subtree" ->
      """WITH RECURSIVE k AS (
        |  SELECT source, CAST(SUBSTRING(source, 4) AS INT) AS k
        |  FROM (SELECT DISTINCT source FROM documents)),
        |sub AS (
        |  SELECT source, k FROM k WHERE k >= 1 AND k // 2 = 2
        |  UNION
        |  SELECT c.source, c.k FROM k c JOIN sub p ON c.k // 2 = p.k
        |  WHERE c.k >= 1)
        |SELECT source AS name FROM sub ORDER BY name""".stripMargin,

    "q33_artifact_roundtrip" ->
      """SELECT source, count(*) AS n_docs,
        |       CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM documents WHERE lang = 'en'
        |GROUP BY source ORDER BY source""".stripMargin,

    "q34_to_dataframe_trunc" ->
      """SELECT doc_id, lang,
        |  (SELECT count(*) FROM documents WHERE lang = 'en') > 20 AS is_truncated
        |FROM documents WHERE lang = 'en'
        |ORDER BY doc_id DESC LIMIT 20""".stripMargin,

    "q35_run_inputs" ->
      """SELECT 'src/' || name AS key, CAST(1 AS BIGINT) AS run_id
        |FROM (SELECT DISTINCT source AS name FROM documents)
        |WHERE CAST(SUBSTRING(name, 4) AS INT) % 2 = 0
        |ORDER BY key""".stripMargin,

    "q38_collection_append" ->
      """SELECT source, count(*) AS n_docs,
        |       CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM documents WHERE source IN ('src0', 'src1', 'src2')
        |GROUP BY source ORDER BY source""".stripMargin,

    "q41_cache_stale" ->
      """SELECT source, count(*) AS n_docs,
        |       CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM documents WHERE lang = 'fr'
        |GROUP BY source ORDER BY source""".stripMargin,

    "q42_transfer_remap" ->
      """SELECT DISTINCT source AS name,
        |  'type_' || CAST(CAST(SUBSTRING(source, 4) AS INT) % 3 AS VARCHAR) AS type_name
        |FROM documents ORDER BY name""".stripMargin,

    "q43_path_get" ->
      """SELECT 'src/' || source AS key, CAST(count(*) AS BIGINT) AS n_obs
        |FROM documents
        |WHERE CAST(SUBSTRING(source, 4) AS INT) % 2 = 0
        |GROUP BY source ORDER BY key""".stripMargin,

    "q30_trash_restore" ->
      """WITH s AS (SELECT DISTINCT source AS name FROM documents)
        |SELECT name, CAST(1 AS BIGINT) AS branch_id FROM s
        |WHERE CAST(SUBSTRING(name, 4) AS INT) % 2 = 1
        |   OR CAST(SUBSTRING(name, 4) AS INT) % 4 = 0
        |ORDER BY name""".stripMargin,

    "q31_get_ladder" ->
      """WITH fam AS (SELECT DISTINCT source, lang FROM documents),
        |v AS (SELECT source,
        |        row_number() OVER (PARTITION BY source ORDER BY lang) AS rn,
        |        count(*) OVER (PARTITION BY source) AS mx FROM fam),
        |r AS (SELECT source, dense_rank() OVER (ORDER BY source) AS sr
        |      FROM (SELECT DISTINCT source FROM documents))
        |SELECT v.source,
        |       concat(substr(md5(v.source), 1, 16),
        |              lpad(CAST(v.rn AS VARCHAR), 4, '0')) AS uid,
        |       (v.rn = v.mx AND r.sr > 1) AS is_latest
        |FROM v JOIN r ON v.source = r.source
        |WHERE r.sr <= 3 AND v.rn = v.mx
        |ORDER BY v.source""".stripMargin
  )
}
