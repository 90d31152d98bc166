package graft.artifact

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.curate.{SchemaSpec, SlotsCurator}

/** Spark-native AnnData (the SURVEY §7.4 ingest bridge).
  *
  * The reference's core datatype is a backed AnnData file: an
  * observations × variables matrix `X` with aligned metadata frames
  * `obs` and `var`, sliceable without loading
  * (`core/storage/_anndata_accessor.py:516-700`,
  * `_backed_access.py:108-121`) and ingested via `Artifact.from_anndata`
  * (`models/artifact.py:2374`). HDF5/zarr have no JVM/Spark reader, so
  * this bridge re-expresses the same object model in the engine's own
  * terms rather than parsing those containers:
  *
  *  - `obs`  — one row per observation, keyed `obs_id`;
  *  - `vars` — one row per variable, keyed `var_id` with a `var_name`;
  *  - `x`    — the matrix in COO long form `(obs_id, var_id, value)`.
  *
  * COO is the deliberate 100 TB layout: it is sparse-natural (absent
  * entries cost nothing), partitionable on `obs_id` so obs-slicing is
  * partition-pruned, and every downstream op (slice, per-var aggregate,
  * matrix join) is an equi-join/group-by Catalyst can plan — none of
  * which holds for a dense row-major array column. A dense view stays
  * one `pivot` away for bounded variable counts (`xWide`).
  *
  * Slicing mirrors `AnnDataAccessorSubset.__getitem__`
  * (`_anndata_accessor.py:636-655`): predicates restrict `obs`/`vars`,
  * and `x` plus per-axis aux matrices follow through semi-joins —
  * declared lazily, so Catalyst pushes the predicate into every scan and
  * the matrix is never materialized wider than the slice.
  */
final case class AnnDataset(obs: DataFrame, vars: DataFrame, x: DataFrame,
                            obsm: Map[String, DataFrame] = Map.empty,
                            layers: Map[String, DataFrame] = Map.empty) {

  def nObs: Long = obs.count()
  def nVars: Long = vars.count()
  def shape: (Long, Long) = (nObs, nVars)

  /** `adata[mask, :]` — restrict observations; X / layers / obsm follow. */
  def subsetObs(pred: Column): AnnDataset = {
    val kept = obs.filter(pred)
    val keptIds = kept.select("obs_id")
    copy(
      obs = kept,
      x = x.join(keptIds, Seq("obs_id"), "left_semi"),
      obsm = obsm.map { case (k, m) => k -> m.join(keptIds, Seq("obs_id"), "left_semi") },
      layers = layers.map { case (k, l) => k -> l.join(keptIds, Seq("obs_id"), "left_semi") })
  }

  /** `adata[:, mask]` — restrict variables; X / layers follow. */
  def subsetVars(pred: Column): AnnDataset = {
    val kept = vars.filter(pred)
    val keptIds = kept.select("var_id")
    copy(
      vars = kept,
      x = x.join(keptIds, Seq("var_id"), "left_semi"),
      layers = layers.map { case (k, l) => k -> l.join(keptIds, Seq("var_id"), "left_semi") })
  }

  /** Dense view: one row per obs, one column per var_name (the in-memory
    * AnnData orientation, `to_memory`). Only sane for bounded var counts
    * — the pivot is capped to guard against accidentally materializing a
    * 100 TB matrix wide.
    */
  def xWide(maxVars: Int = 10000): DataFrame = {
    val names = vars.orderBy("var_id").select("var_id", "var_name")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    require(names.length <= maxVars,
      s"xWide on ${names.length} vars exceeds maxVars=$maxVars; stay in COO form at this width")
    val byName = x.join(broadcast(vars.select("var_id", "var_name")), "var_id")
    byName.groupBy("obs_id")
      .pivot("var_name", names.map(_._2).toSeq)
      .agg(first("value"))
  }

  /** Per-variable aggregate over the current slice — the bridge's
    * workhorse (mean expression per gene, etc.): ONE shuffle on var_id.
    */
  def perVarStats: DataFrame =
    x.groupBy("var_id")
      .agg(count(lit(1)).as("n_obs"),
        sum(col("value").cast("decimal(28,10)")).as("sum_value"))
      .join(broadcast(vars.select("var_id", "var_name")), "var_id")
}

object AnnBridge {

  /** `Artifact.from_anndata` (`artifact.py:2374-2498`): persist the three
    * aligned tables as ONE managed directory artifact with
    * `otype="AnnData"` and `n_observations` from `obs`. Aux matrices
    * (obsm embeddings, layers) persist as additional slots. Content-hash
    * idempotent like every artifact constructor.
    */
  def ingest(store: ArtifactStore, ds: AnnDataset, key: String, storageRoot: String,
             description: String = null, validateShape: Boolean = false): Map[String, Any] = {
    if (validateShape) {
      // X must be aligned: every coordinate resolves in obs/vars
      val orphanObs = ds.x.join(ds.obs.select("obs_id"), Seq("obs_id"), "left_anti").count()
      val orphanVar = ds.x.join(ds.vars.select("var_id"), Seq("var_id"), "left_anti").count()
      require(orphanObs == 0 && orphanVar == 0,
        s"X is misaligned: $orphanObs entries without obs row, $orphanVar without var row")
    }
    val slots =
      Seq("obs" -> ds.obs, "var" -> ds.vars, "X" -> ds.x) ++
        ds.obsm.toSeq.sortBy(_._1).map { case (k, m) => s"obsm.$k" -> m } ++
        ds.layers.toSeq.sortBy(_._1).map { case (k, l) => s"layers.$k" -> l }
    store.fromSlots(slots, key, storageRoot, suffix = ".anndata", otype = "AnnData",
      nObservations = Some(ds.nObs), description = description)
  }

  /** Backed open: every slot is a lazy Parquet scan — nothing loads until
    * a query touches it (the accessor's backed contract).
    */
  def open(store: ArtifactStore, uid: String): AnnDataset = {
    val slots = store.listSlots(uid)
    require(Seq("obs", "var", "X").forall(slots.contains),
      s"artifact $uid is not an AnnData bridge artifact (slots: ${slots.mkString(", ")})")
    AnnDataset(
      obs = store.openSlot(uid, "obs"),
      vars = store.openSlot(uid, "var"),
      x = store.openSlot(uid, "X"),
      obsm = slots.filter(_.startsWith("obsm."))
        .map(s => s.stripPrefix("obsm.") -> store.openSlot(uid, s)).toMap,
      layers = slots.filter(_.startsWith("layers."))
        .map(s => s.stripPrefix("layers.") -> store.openSlot(uid, s)).toMap)
  }

  /** `AnnDataCurator` (`curators/core.py:1155`): slot-wise curation over
    * the REAL slots this bridge materializes. The reference validates
    * `obs` columns and the columns of `var.T` (i.e. the var NAMES, e.g.
    * gene ids); in relational form the latter is exactly a categorical
    * membership check of `var_name` — express it in `varSpec` with a
    * `catRegistry` on `var_name`.
    */
  def curate(ds: AnnDataset, obsSpec: SchemaSpec, varSpec: SchemaSpec)
      : Seq[SlotsCurator.SlotReport] =
    SlotsCurator.validate(Map("obs" -> (ds.obs, obsSpec), "var" -> (ds.vars, varSpec)))
}
