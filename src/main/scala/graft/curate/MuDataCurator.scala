package graft.curate

import org.apache.spark.sql.DataFrame

/** A MuData/SpatialData-like multimodal dataset: global slot tables
  * (`obs`, `var` on the container itself) plus named modalities, each
  * carrying its own slot tables (reference: `MuData`, and
  * `sdata.tables[key]` for SpatialData).
  */
final case class MuDataset(
    global: Map[String, DataFrame] = Map.empty,
    modalities: Map[String, Map[String, DataFrame]] = Map.empty)

/** What a slot validates against. */
sealed trait SlotSchema

/** Ordinary column-wise schema (the DataFrameCurator model). */
final case class ColumnsSpec(spec: SchemaSpec) extends SlotSchema

/** Index-as-columns validation — the meaning of a `var.T` slot
  * (`curators/core.py:1305-1320`): transposing var makes the var index
  * the column axis, and column validation under a non-Feature itype is
  * membership of those identifiers in a registry (e.g. Gene ensembl ids).
  * Re-expressed Spark-first as one anti-join of the id column's values
  * against the registry, instead of materializing a 20k-wide frame.
  */
final case class IndexSpec(idCol: String, registry: DataFrame, field: String) extends SlotSchema

/** Modality-prefixed slot wiring for MuData- and SpatialData-shaped
  * datasets (`MuDataCurator`, `curators/core.py:1255`;
  * `SpatialDataCurator`, `:1338`), layered over [[SlotsCurator]].
  *
  * Slot-key grammar (same strings the reference accepts):
  *   - `"obs"` / `"var"`                — a global slot on the container
  *   - `"rna:obs"` / `"rna:var"`        — a modality's slot
  *   - `"rna:var.T"`                    — a modality's var, transposed
  *   - `"tables:key:obs"`               — SpatialData table slot
  *   - `"attrs:key"`                    — SpatialData attrs entry (a
  *                                        global slot named `key`)
  */
object MuDataCurator {

  final case class ResolvedSlot(df: DataFrame, transposed: Boolean)

  /** Resolve one slot key; unknown modalities/slots raise like the
    * reference's `InvalidArgument` (`curators/core.py:1293-1301`).
    */
  def resolveSlot(mdata: MuDataset, key: String): ResolvedSlot = {
    def slotOf(tables: Map[String, DataFrame], slot: String, where: String): ResolvedSlot = {
      val base = slot.stripSuffix(".T")
      val df = tables.getOrElse(base,
        throw new IllegalArgumentException(s"Attribute '$base' not found on $where"))
      ResolvedSlot(df, transposed = slot.endsWith(".T"))
    }
    key.split(":").toList match {
      // SpatialData's non-tabular element kinds (`SpatialDataCurator`
      // addresses them in the reference, `curators/core.py:1338`): raster
      // and geometry payloads have no tabular re-expression here, so the
      // rejection is explicit instead of a misleading "modality not found"
      case ("images" | "shapes" | "points" | "labels") :: _ =>
        throw new IllegalArgumentException(
          s"Slot '$key' addresses a non-tabular SpatialData element " +
            "(images/shapes/points/labels) — out of engine scope; only " +
            "tabular slots are supported ('tables:key:slot', 'attrs:key', " +
            "'modality:slot')")
      case "tables" :: table :: slot :: Nil =>
        val tables = mdata.modalities.getOrElse(table,
          throw new IllegalArgumentException(s"Table '$table' not found in sdata.tables"))
        slotOf(tables, slot, s"table '$table'")
      case "attrs" :: name :: Nil =>
        slotOf(mdata.global, name, "attrs")
      case mod :: slot :: Nil =>
        val tables = mdata.modalities.getOrElse(mod,
          throw new IllegalArgumentException(s"Modality '$mod' not found in MuData"))
        slotOf(tables, slot, s"modality '$mod'")
      case slot :: Nil =>
        slotOf(mdata.global, slot, "MuData")
      case _ =>
        throw new IllegalArgumentException(s"Unrecognized slot format: $key")
    }
  }

  /** Validate every slot of the schema against the dataset. A transposed
    * slot (or a plain `var` slot given an IndexSpec — the reference's
    * auto-transpose backward-compat, `curators/core.py:1310-1318`)
    * validates its identifier values; others validate column-wise.
    */
  def validate(mdata: MuDataset,
               schema: Map[String, SlotSchema]): Seq[SlotsCurator.SlotReport] =
    schema.toSeq.sortBy(_._1).map { case (key, slotSchema) =>
      val resolved = resolveSlot(mdata, key)
      val report = (slotSchema, resolved.transposed) match {
        case (ColumnsSpec(spec), false) =>
          SchemaValidator.validate(resolved.df, spec)
        case (ColumnsSpec(_), true) =>
          throw new IllegalArgumentException(
            s"slot '$key' is transposed; validate its index with an IndexSpec")
        case (IndexSpec(idCol, reg, field), _) =>
          validateIndex(resolved.df, idCol, reg, field)
      }
      SlotsCurator.SlotReport(key, report)
    }

  def passed(reports: Seq[SlotsCurator.SlotReport]): Boolean =
    reports.forall(_.report.passed)

  /** Index membership as a ValidationReport: distinct non-member ids,
    * mirroring the `non_validated` issues of categorical columns.
    */
  private def validateIndex(df: DataFrame, idCol: String,
                            registry: DataFrame, field: String): ValidationReport = {
    val bad = SchemaValidator.catViolations(df, idCol, registry, field).collect()
    val issues = bad.toSeq.map { r =>
      ValidationIssue("non_validated", idCol,
        Option(r.get(0)).map(_.toString).getOrElse("null"), r.getLong(1))
    }
    ValidationReport(issues.isEmpty, issues)
  }
}
