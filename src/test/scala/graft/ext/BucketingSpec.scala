package graft.ext

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class BucketingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("bucketed join on matching bucket counts elides the shuffle") {
    val li = spark.read.parquet(s"${TestSpark.sf0001}/lineitem.parquet")
      .select("l_orderkey", "l_quantity")
    val o = spark.read.parquet(s"${TestSpark.sf0001}/orders.parquet")
      .select("o_orderkey", "o_orderstatus")

    // force sort-merge joins so the comparison isolates the shuffle
    // (at this tiny SF the planner would broadcast either side)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      // the plain join shuffles both sides
      val plain = li.join(o, li("l_orderkey") === o("o_orderkey"))
      assert(Bucketing.hasShuffle(plain))

      Bucketing.writeBucketed(li, "li_b", "l_orderkey", 4, sortCol = Some("l_orderkey"))
      Bucketing.writeBucketed(o, "o_b", "o_orderkey", 4, sortCol = Some("o_orderkey"))
      val bucketed = Bucketing.bucketedJoin(spark, "li_b", "o_b", "l_orderkey", "o_orderkey")
      assert(!Bucketing.hasShuffle(bucketed))

      // same results either way
      val a = plain.groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
        .orderBy("o_orderstatus").collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      val b = bucketed.groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
        .orderBy("o_orderstatus").collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      assert(a === b)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS li_b")
      spark.sql("DROP TABLE IF EXISTS o_b")
    }
  }

  test("partitioned layout prunes directories for partition-key predicates") {
    val docs = spark.read.parquet(s"${TestSpark.sf0001}/documents.parquet")
      .select("doc_id", "lang", "n_chars")
    val nLangs = docs.select("lang").distinct().count()
    val path = TestSpark.tmpDir("part-prune") + "/docs"
    Bucketing.writePartitioned(docs, path, "lang")

    val all = spark.read.parquet(path)
    assert(Bucketing.partitionsRead(all) === nLangs)
    val pruned = spark.read.parquet(path).filter(col("lang") === "en")
    assert(Bucketing.partitionsRead(pruned) === 1L)
    // the pruned scan still returns exactly the english rows
    assert(pruned.count() === docs.filter(col("lang") === "en").count())
  }
}
