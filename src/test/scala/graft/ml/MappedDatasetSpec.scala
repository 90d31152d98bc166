package graft.ml

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class MappedDatasetSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val store1 = Seq((1L, "T cell", 0.1), (2L, "B cell", 0.2))
    .toDF("obs_id", "cell_type", "score")
  private lazy val store2 = Seq((3L, "T cell", 0.3), (4L, "NK cell", 0.4), (5L, "T cell", 0.5))
    .toDF("obs_id", "cell_type", "score")
  private lazy val store3 = Seq((6L, "B cell")).toDF("obs_id", "cell_type") // no score col

  test("mapped union routes rows by (store_idx, local_idx)") {
    val m = MappedDataset.mapped(Seq(store1, store2), orderCol = Some("obs_id"))
    assert(m.count() === 5)
    val routed = m.select("store_idx", "local_idx", "obs_id")
      .as[(Int, Long, Long)].collect().toSet
    assert(routed === Set((0, 0L, 1L), (0, 1L, 2L), (1, 0L, 3L), (1, 1L, 4L), (1, 2L, 5L)))
  }

  test("inner join drops non-shared columns, outer keeps with nulls") {
    val inner = MappedDataset.mapped(Seq(store1, store3), "inner", Some("obs_id"))
    assert(inner.columns.toSet === Set("cell_type", "obs_id", "store_idx", "local_idx"))
    val outer = MappedDataset.mapped(Seq(store1, store3), "outer", Some("obs_id"))
    assert(outer.columns.contains("score"))
    assert(outer.filter(col("score").isNull).count() === 1)
  }

  test("label encoding: sorted codes, unknown -> -1") {
    val m = MappedDataset.mapped(Seq(store1, store2), orderCol = Some("obs_id"))
    val (encoded, dict) = MappedDataset.encodeLabels(m, "cell_type",
      knownLabels = Some(Seq("B cell", "T cell"))) // NK cell unknown
    val codes = dict.as[(String, Int)].collect().toMap
    assert(codes === Map("B cell" -> 0, "T cell" -> 1))
    val byObs = encoded.select("obs_id", "label_code").as[(Long, Int)].collect().toMap
    assert(byObs(1L) === 1 && byObs(2L) === 0 && byObs(4L) === -1)
  }

  test("obs_filter: isin masks per store, original local indices, AND across keys") {
    // rows keep their pre-filter in-store position (reference
    // indices_storage = np.where(mask): original row indices)
    val m = MappedDataset.mapped(Seq(store1, store2), orderCol = Some("obs_id"),
      obsFilter = Map("cell_type" -> Seq("T cell")))
    val routed = m.select("store_idx", "local_idx", "obs_id")
      .as[(Int, Long, Long)].collect().toSet
    assert(routed === Set((0, 0L, 1L), (1, 0L, 3L), (1, 2L, 5L)))
    // AND across filter keys
    val m2 = MappedDataset.mapped(Seq(store1, store2), orderCol = Some("obs_id"),
      obsFilter = Map("cell_type" -> Seq("T cell"), "obs_id" -> Seq(3L, 5L)))
    assert(m2.select("obs_id").as[Long].collect().toSet === Set(3L, 5L))
    // a store missing the filter column contributes nothing (all-false)
    val m3 = MappedDataset.mapped(Seq(store1, store3), "inner", Some("obs_id"),
      obsFilter = Map("score" -> Seq(0.1, 0.2)))
    assert(m3.select("store_idx").as[Int].collect().toSet === Set(0))
    // a null among filter values matches null labels (pd.isna branch)
    val withNull = Seq((7L, null.asInstanceOf[String]), (8L, "B cell"))
      .toDF("obs_id", "cell_type")
    val m4 = MappedDataset.mapped(Seq(withNull), orderCol = Some("obs_id"),
      obsFilter = Map("cell_type" -> Seq("T cell", null)))
    assert(m4.select("obs_id").as[Long].collect().toSet === Set(7L))
  }

  test("unknown_label is removed from the category set and encodes to -1") {
    val m = MappedDataset.mapped(Seq(store1, store2), orderCol = Some("obs_id"))
    // merged cats = {B cell, NK cell, T cell}; NK declared unknown -> codes
    // stay dense over the remaining cats: B=0, T=1
    val (encoded, dict) = MappedDataset.encodeLabels(m, "cell_type",
      unknownLabel = Some("NK cell"))
    assert(dict.as[(String, Int)].collect().toMap === Map("B cell" -> 0, "T cell" -> 1))
    val byObs = encoded.select("obs_id", "label_code").as[(Long, Int)].collect().toMap
    assert(byObs === Map(1L -> 1, 2L -> 0, 3L -> 1, 4L -> -1, 5L -> 1))
    // same contract on the explicit knownLabels path
    val (_, d2) = MappedDataset.encodeLabels(m, "cell_type",
      knownLabels = Some(Seq("B cell", "NK cell", "T cell")), unknownLabel = Some("NK cell"))
    assert(d2.as[(String, Int)].collect().toMap === Map("B cell" -> 0, "T cell" -> 1))
  }

  test("inverse-frequency label weights") {
    val m = MappedDataset.mapped(Seq(store1, store2), orderCol = Some("obs_id"))
    val w = MappedDataset.labelWeights(m, "cell_type")
      .select("obs_id", "label_weight").as[(Long, Double)].collect().toMap
    assert(w(1L) === 1.0 / 3) // T cell x3
    assert(w(2L) === 1.0)     // B cell x1
  }

  test("epoch iterator: deterministic seeded order, full coverage") {
    val m = MappedDataset.mapped(Seq(store1, store2), orderCol = Some("obs_id"))
    val e1 = MappedDataset.epochIterator(m, seed = 7, Seq("store_idx", "local_idx", "obs_id")).toSeq
    val e2 = MappedDataset.epochIterator(m, seed = 7, Seq("store_idx", "local_idx", "obs_id")).toSeq
    val e3 = MappedDataset.epochIterator(m, seed = 8, Seq("store_idx", "local_idx", "obs_id")).toSeq
    assert(e1 === e2)                       // same seed, same order
    assert(e1.map(_.getLong(2)).toSet === Set(1L, 2L, 3L, 4L, 5L))
    assert(e1 !== e3)                       // different seed reshuffles
  }

  test("worker shards are disjoint, complete, and serve whole round-robin batches") {
    val df = spark.range(0, 100).select($"id".as("doc_id"))
    val sharded = MappedDataset.workerShard(df, Seq("doc_id"), batchSize = 8, numWorkers = 3)
    val rows = sharded.collect()
    // disjoint + complete: every row has exactly one worker
    assert(rows.length === 100)
    assert(rows.map(_.getAs[Long]("doc_id")).toSet === (0L until 100L).toSet)
    // batch b -> worker b % 3, whole batches only
    rows.foreach { r =>
      val b = r.getAs[Long]("batch_idx")
      assert(b === r.getAs[Long]("global_idx") / 8)
      assert(r.getAs[Int]("worker_id") === (b % 3).toInt)
    }
    // worker 0 serves batches 0,3,6,9,12 -> 8+8+8+8+4 rows (tail batch short)
    assert(rows.count(_.getAs[Int]("worker_id") === 0) === 36)
    assert(rows.count(_.getAs[Int]("worker_id") === 1) === 32)
    assert(rows.count(_.getAs[Int]("worker_id") === 2) === 32)
  }
}
