package graft.artifact

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Native FCS reader against the committed fixture (tools/gen_fcs.py —
  * closed form: value[e][p] = ((e*7 + p*13) % 101) * 0.25, channels
  * FSC/SSC/FL1/FL2, 500 events).
  */
class FcsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val fixture = "fixtures/fcs/events.fcs"

  private def v(e: Int, p: Int): Double = ((e * 7 + p * 13) % 101) * 0.25

  test("header + TEXT segment parse: offsets, keywords, channels") {
    val m = FcsReader.meta(fixture)
    assert(m.nEvents == 500)
    assert(m.channels == Seq("FSC", "SSC", "FL1", "FL2"))
    assert(m.datatype == "F" && m.bytesPerValue == 4 && m.littleEndian)
    assert(m.text("$MODE").trim == "L")
  }

  test("TEXT delimiter escaping: doubled delimiter is a literal") {
    val seg = "/k1/a//b/k2/plain/".getBytes("ASCII")
    val kv = FcsReader.parseText(seg)
    assert(kv == Map("K1" -> "a/b", "K2" -> "plain"))
  }

  test("distributed event-range read decodes every value") {
    val df = FcsReader.read(spark, fixture)
    assert(df.columns.toSeq == Seq("event_id", "FSC", "SSC", "FL1", "FL2"))
    val rows = df.orderBy("event_id").collect()
    assert(rows.length == 500)
    rows.zipWithIndex.foreach { case (r, e) =>
      assert(r.getLong(0) == e)
      (0 until 4).foreach(p => assert(r.getDouble(p + 1) == v(e, p), s"[$e][$p]"))
    }
  }

  test("ArtifactStore.open routes .fcs through the native reader") {
    import graft.catalog.Catalog
    val root = java.nio.file.Files.createTempDirectory("graft_fcs").toString
    val cat = Catalog.deterministic(spark, root)
    val store = new ArtifactStore(cat)
    val abs = new java.io.File(fixture).getAbsolutePath
    store.registerBatch(Seq(store.StatEntry(
      "fcsfixture", "md5", new java.io.File(fixture).length(), 1L,
      "cyto/events.fcs", ".fcs", Some(abs))),
      storageId = store.ensureStorage(root))
    val df = store.open(cat.table("artifact").filter(col("suffix") === ".fcs"))
    assert(df.count() == 500)
    assert(df.columns.contains("FSC") && df.columns.contains("_source_path"))
  }
}
