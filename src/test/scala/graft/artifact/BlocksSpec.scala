package graft.artifact

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.catalog.Catalog

class BlocksSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("readme recovery by hash and blank head; trash breaks the identity") {
    val cat = Catalog.deterministic(spark, TestSpark.tmpDir("blocks"))
    val blocks = new Blocks(cat)
    val b1 = blocks.create("__lamindb_block__", content = "1")
    // identical content recovers the same block (global hash dedup)
    val b2 = blocks.create("__lamindb_block__", content = "1")
    assert(b2("uid") === b1("uid"))
    // same content under a DIFFERENT key also recovers it, keeping the
    // original key (block.py:344-360 warns and keeps the original)
    val b2b = blocks.create("other_key", content = "1")
    assert(b2b("uid") === b1("uid"))
    assert(b2b("key") === "__lamindb_block__")
    // blank new content over a non-blank head is a NEW version in-family
    val b3 = blocks.create("__lamindb_block__")
    assert(b3("uid") !== b1("uid"))
    assert(b3("uid").toString.take(16) === b1("uid").toString.take(16))
    assert(cat.table("block").count() === 2)
    // now the head is blank: any create with this key recovers the blank
    // head ("no content was yet saved, returning existing block")
    val b4 = blocks.create("__lamindb_block__", content = "fresh words")
    assert(b4("uid") === b3("uid"))
    // after trash, recreation starts a fresh identity
    blocks.trash(Seq(b1("id").asInstanceOf[Long], b3("id").asInstanceOf[Long]))
    val b5 = blocks.create("__lamindb_block__", content = "1")
    assert(b5("uid") !== b1("uid"))
  }

  test("readme with changed content revises in the same family; head flips") {
    val cat = Catalog.deterministic(spark, TestSpark.tmpDir("blocks"))
    val blocks = new Blocks(cat)
    val v1 = blocks.create("README.md", content = "# v1\n\nhello")
    val v2 = blocks.create("README.md", content = "# v2\n\nhello")
    assert(v2("uid").toString.take(16) === v1("uid").toString.take(16))
    assert(v2("uid") !== v1("uid"))
    val heads = cat.table("block")
      .filter(org.apache.spark.sql.functions.col("is_latest"))
      .select("uid").collect().map(_.getString(0))
    assert(heads.toSeq === Seq(v2("uid")))
    assert(blocks.latestReadme("README.md") === Some("# v2\n\nhello"))
  }

  test("record blocks: readme revises per (record, kind); notes return latest") {
    val cat = Catalog.deterministic(spark, TestSpark.tmpDir("rblocks"))
    val blocks = new Blocks(cat)
    val rec = cat.insert("record", Map("name" -> "sheet-row"))
    val rid = rec("id").asInstanceOf[Long]
    val v1 = blocks.createForRecord(rid, content = "first notes")
    // the generic init path has NO hash dedup: identical content is a NEW
    // version in the same family (block.py:100-165)
    val v1b = blocks.createForRecord(rid, content = "first notes")
    assert(v1b("uid") !== v1("uid"))
    assert(v1b("uid").toString.take(16) === v1("uid").toString.take(16))
    // changed content keeps revising in-family
    val v2 = blocks.createForRecord(rid, content = "updated notes")
    assert(v2("uid").toString.take(16) === v1("uid").toString.take(16))
    assert(blocks.recordNotes(rid) === Some("updated notes"))
    // a different record has its own family
    val other = cat.insert("record", Map("name" -> "other"))
    val o1 = blocks.createForRecord(other("id").asInstanceOf[Long], content = "x")
    assert(o1("uid").toString.take(16) !== v1("uid").toString.take(16))
    // a BLANK existing head is recovered by any later create ("no content
    // was yet saved"), regardless of the new content
    val blankRec = cat.insert("record", Map("name" -> "blank"))
    val bid = blankRec("id").asInstanceOf[Long]
    val b0 = blocks.createForRecord(bid)
    assert(blocks.createForRecord(bid, content = "ignored")("uid") === b0("uid"))
    // comments on records are always new
    val c1 = blocks.createForRecord(rid, content = "hm", kind = "comment")
    val c2 = blocks.createForRecord(rid, content = "hm", kind = "comment")
    assert(c1("uid") !== c2("uid"))
  }

  test("comments are never versioned or recovered") {
    val cat = Catalog.deterministic(spark, TestSpark.tmpDir("blocks"))
    val blocks = new Blocks(cat)
    val c1 = blocks.create("issue-1", content = "same words", kind = "comment")
    val c2 = blocks.create("issue-1", content = "same words", kind = "comment")
    assert(c1("uid") !== c2("uid"))
    assert(cat.table("block").count() === 2)
    // anchored comment (comment on a block)
    val c3 = blocks.create("issue-1", content = "reply", kind = "comment",
      anchorId = Some(c1("id").asInstanceOf[Long]))
    assert(c3("anchor_id") === c1("id"))
  }
}
