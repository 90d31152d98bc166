package graft.ml

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** ML-loading surface: the Spark re-expression of the reference's
  * MappedCollection (`lamindb/core/_mapped_collection.py`) — a virtual
  * concat of N stores exposed as an indexable dataset for training loops.
  *
  * The reference routes a global index to (store, local index) via
  * cumulative-count arrays; here the union IS the routing: every row
  * carries (store_idx, local_idx) computed with window functions, labels
  * are dictionary-encoded by a broadcast join (unknown → -1, like
  * `unknown_label`), and per-label inverse-frequency weights support
  * balanced sampling. Batch iteration = `toLocalIterator` over an
  * explicitly ordered plan.
  */
object MappedDataset {

  /** Union the per-store DataFrames with explicit (store_idx, local_idx)
    * routing columns. Column spaces align inner or outer
    * (`_make_join_vars`, `join="inner"/"outer"`).
    *
    * `obsFilter` is the reference's `obs_filter` dict
    * (`_mapped_collection.py:200-221`): per store, one isin mask per
    * (column -> values) entry, AND-combined; a store missing the column
    * contributes NOTHING (all-false mask); a null among the filter values
    * additionally matches null labels (the `pd.isna` branch). Local
    * indices are assigned BEFORE filtering, so a routed row keeps its
    * original in-store position (`indices_storage = np.where(mask)`).
    */
  def mapped(stores: Seq[DataFrame], join: String = "inner",
             orderCol: Option[String] = None,
             obsFilter: Map[String, Seq[Any]] = Map.empty): DataFrame = {
    require(stores.nonEmpty, "no stores")
    val indexed = stores.zipWithIndex.map { case (df, i) =>
      val ordered = orderCol match {
        case Some(c) => Window.orderBy(col(c))
        case None    => Window.orderBy(monotonically_increasing_id())
      }
      val withIdx = df.withColumn("store_idx", lit(i))
        .withColumn("local_idx", row_number().over(ordered).cast("long") - 1)
      val mask = obsFilter.toSeq.sortBy(_._1).map { case (key, values) =>
        if (!df.columns.contains(key)) lit(false)
        else {
          val nonNull = values.filter(_ != null)
          val base = if (nonNull.nonEmpty) col(key).isin(nonNull: _*) else lit(false)
          if (values.exists(_ == null)) base || col(key).isNull else base
        }
      }.reduceOption(_ && _)
      mask.map(withIdx.filter).getOrElse(withIdx)
    }
    val aligned = join match {
      case "outer" => indexed
      case "inner" =>
        val common = stores.map(_.columns.toSet).reduce(_ intersect _).toSeq.sorted
        indexed.map(_.select((common.map(col) :+ col("store_idx") :+ col("local_idx")): _*))
      case other => throw new IllegalArgumentException(s"join must be inner/outer, got $other")
    }
    aligned.reduce(_.unionByName(_, allowMissingColumns = join == "outer"))
  }

  /** Dictionary-encode a label column: (label -> int code) by sorted
    * label order over the MERGED categories (`get_merged_categories` —
    * the input here is already the merged union view). The reference's
    * `unknown_label` contract (`_make_encoders`,
    * `_mapped_collection.py:302-314`): the unknown label is REMOVED from
    * the category set before enumeration — so the remaining codes stay
    * dense from 0 — and encodes to -1, as do labels absent from the
    * dictionary and nulls. Returns (encoded df, dictionary).
    */
  def encodeLabels(df: DataFrame, labelCol: String,
                   knownLabels: Option[Seq[String]] = None,
                   unknownLabel: Option[String] = None): (DataFrame, DataFrame) = {
    val dict = knownLabels match {
      case Some(ls) =>
        val spark = df.sparkSession
        import spark.implicits._
        ls.filterNot(unknownLabel.contains).sorted.zipWithIndex
          .map { case (l, i) => (l, i) }.toDF(labelCol, "label_code")
      case None =>
        val cats = df.select(labelCol).distinct()
        val kept = unknownLabel.map(u => cats.filter(col(labelCol) =!= u)).getOrElse(cats)
        kept.withColumn("label_code",
          (row_number().over(Window.orderBy(col(labelCol))) - 1))
    }
    val encoded = df.join(broadcast(dict), Seq(labelCol), "left")
      .withColumn("label_code", coalesce(col("label_code"), lit(-1)))
    (encoded, dict)
  }

  /** Inverse-frequency label weights for balanced sampling
    * (`get_label_weights`, `_mapped_collection.py:522-565`): weight =
    * 1 / count(label), broadcast back onto every row.
    */
  def labelWeights(df: DataFrame, labelCol: String): DataFrame = {
    val freq = df.groupBy(labelCol).agg(count(lit(1)).as("__n"))
      .withColumn("label_weight", lit(1.0) / col("__n")).drop("__n")
    df.join(broadcast(freq), Seq(labelCol), "left")
  }

  /** Round-robin batch sharding — the parallel-loader worker split. A
    * torch DataLoader with `num_workers=N` serves batch b from worker
    * b % N; the reference leans on that split and re-opens store
    * connections per worker (`torch_worker_init_fn`,
    * `_mapped_collection.py:691-703`). Here the split is explicit data:
    * every row gets (global_idx, batch_idx, worker_id), so
    * `filter(worker_id === w)` IS worker w's shard — shards are disjoint,
    * complete, and each serves whole contiguous batches.
    *
    * The global row_number runs unpartitioned — fine for the loader tier
    * (an epoch's index assignment is one pass over row ids); shard the
    * underlying scan, not this bookkeeping, at 100 TB.
    */
  def workerShard(df: DataFrame, orderCols: Seq[String], batchSize: Int,
                  numWorkers: Int): DataFrame = {
    require(batchSize > 0 && numWorkers > 0, "batchSize and numWorkers must be positive")
    df.withColumn("global_idx",
        row_number().over(Window.orderBy(orderCols.map(col): _*)).cast("long") - 1)
      .withColumn("batch_idx", expr(s"global_idx div $batchSize"))
      .withColumn("worker_id", (col("batch_idx") % numWorkers).cast("int"))
  }

  /** Deterministic epoch iteration: shuffle rows with a seeded hash order
    * and stream batches to the training process without collecting the
    * dataset (`toLocalIterator` = one partition in memory at a time).
    */
  def epochIterator(df: DataFrame, seed: Long, batchCols: Seq[String]): Iterator[Row] = {
    import scala.jdk.CollectionConverters._
    df.select(batchCols.map(col): _*)
      .orderBy(xxhash64(concat_ws("|", col("store_idx"), col("local_idx"), lit(seed))))
      .toLocalIterator().asScala
  }
}
