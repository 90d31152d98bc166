package graft.artifact

import graft.curate.MuDataset

/** Persistence for MuData-shaped multimodal datasets — the storage side
  * of `Artifact.from_mudata` (`artifact.py:2502`): one managed directory
  * artifact whose slots are the global tables plus `<modality>.<slot>`
  * children, mirroring how a MuData container nests per-modality AnnData.
  * Same content-hash idempotency and versioning as every constructor.
  */
object MuBridge {

  /** Flattened slot name: modality slots are dot-prefixed. Global slot
    * names must not collide with that namespace.
    */
  private def flatten(ds: MuDataset): Seq[(String, org.apache.spark.sql.DataFrame)] = {
    ds.global.keys.find(_.contains(".")).foreach(g =>
      throw new IllegalArgumentException(s"global slot '$g' may not contain '.'"))
    ds.global.toSeq.sortBy(_._1) ++
      ds.modalities.toSeq.sortBy(_._1).flatMap { case (mod, slots) =>
        require(!mod.contains("."), s"modality name '$mod' may not contain '.'")
        slots.toSeq.sortBy(_._1).map { case (slot, df) => s"$mod.$slot" -> df }
      }
  }

  def ingest(store: ArtifactStore, ds: MuDataset, key: String, storageRoot: String,
             description: String = null): Map[String, Any] = {
    val slots = flatten(ds)
    require(slots.nonEmpty, "MuData dataset has no slots")
    // n_observations rides the global obs slot's write job when present
    store.fromSlots(slots, key, storageRoot, suffix = ".mudata", otype = "MuData",
      description = description, nObsSlot = Some("obs"))
  }

  /** Backed open: rebuild the modality tree from the slot listing; every
    * slot stays a lazy Parquet scan.
    */
  def open(store: ArtifactStore, uid: String): MuDataset = {
    val slots = store.listSlots(uid)
    val (modal, global) = slots.partition(_.contains("."))
    MuDataset(
      global = global.map(s => s -> store.openSlot(uid, s)).toMap,
      modalities = modal.groupBy(_.split("\\.", 2)(0)).map { case (mod, ss) =>
        mod -> ss.map(s => s.split("\\.", 2)(1) -> store.openSlot(uid, s)).toMap
      })
  }
}
