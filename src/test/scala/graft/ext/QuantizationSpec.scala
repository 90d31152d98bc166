package graft.ext

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class QuantizationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val emb = spark.read.parquet(s"${TestSpark.sf0001}/embeddings.parquet")

  test("PQ is deterministic and codes are within the codebook range") {
    val b1 = Quantization.fit(emb, "vec_id", "embedding", m = 8, k = 16, iters = 2)
    val b2 = Quantization.fit(emb, "vec_id", "embedding", m = 8, k = 16, iters = 2)
    assert(b1.flatten.flatten.toSeq === b2.flatten.flatten.toSeq)
    val codes = Quantization.encode(emb, "vec_id", "embedding", b1)
    assert(codes.count() === emb.count())
    val row = codes.orderBy("id").head()
    assert(row.getAs[Seq[Int]]("codes").length === 8)
    val flat = codes.select(explode(col("codes")).as("c"))
    assert(flat.filter(col("c") < 0 || col("c") >= 16).count() === 0)
    // codes actually use a spread of codewords, not one degenerate cell
    assert(flat.distinct().count() >= 8)
  }

  test("ADC shortlist + exact rerank recalls most exact L2 neighbors") {
    val books = Quantization.fit(emb, "vec_id", "embedding", m = 16, k = 32, iters = 4)
    val encoded = Quantization.encode(emb, "vec_id", "embedding", books)
    val queries = emb.filter(col("vec_id") < 5)
    val approx = Quantization.adcTopKReranked(encoded, emb, queries,
        "vec_id", "embedding", books, topK = 10, rerankFactor = 4)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap

    // exact L2 top-10 via the existing dot/norm helpers: ||a-b||^2 =
    // ||a||^2 + ||b||^2 - 2ab
    val base = emb.select(col("vec_id").cast("long").as("id"),
      transform(col("embedding"), x => x.cast("double")).as("e"))
    val q = base.filter(col("id") < 5)
      .select(col("id").as("query_id"), col("e").as("qe"))
    val exact = base.crossJoin(broadcast(q))
      .filter(col("id") =!= col("query_id"))
      .withColumn("d2",
        Similarity.dot(col("e"), col("e")) + Similarity.dot(col("qe"), col("qe"))
          - lit(2.0) * Similarity.dot(col("e"), col("qe")))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("query_id")
          .orderBy(col("d2").asc, col("id").asc)))
      .filter(col("rank") <= 10)
      .select(col("query_id"), col("id")).as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap

    val recalls = exact.map { case (qid, truth) =>
      approx.getOrElse(qid, Set.empty).intersect(truth).size.toDouble / truth.size
    }
    val meanRecall = recalls.sum / recalls.size
    assert(meanRecall >= 0.75, s"mean recall@10 $meanRecall too low")
    // and the compression is real: 16 int codes vs 64 floats
    assert(books.length === 16 && books(0).length === 32)
  }

  // ---- scalar quantization -------------------------------------------

  test("SQ round-trip: reconstruction error bounded by half a step per dim") {
    val p = Quantization.sqFit(emb, "embedding")
    assert(p.mins.length === 64)
    val encoded = Quantization.sqEncode(emb, "vec_id", "embedding", p)
    val codes = encoded.select(col("id"), col("codes")).as[(Long, Seq[Int])].collect().toMap
    val raw = emb.select(col("vec_id").cast("long"),
        transform(col("embedding"), x => x.cast("double")))
      .as[(Long, Seq[Double])].collect().toMap
    assert(codes.keySet === raw.keySet)
    raw.foreach { case (id, v) =>
      v.indices.foreach { d =>
        val recon = p.mins(d) + codes(id)(d) * p.scales(d)
        val tol = p.scales(d) / 2 + 1e-9
        assert(math.abs(recon - v(d)) <= tol,
          s"vec $id dim $d: |$recon - ${v(d)}| > $tol")
      }
    }
  }

  test("SQ top-k recalls nearly all exact cosine neighbors at int8 precision") {
    val p = Quantization.sqFit(emb, "embedding")
    val encoded = Quantization.sqEncode(emb, "vec_id", "embedding", p)
    val queries = emb.filter(col("vec_id") < 5)
    val approx = Quantization.sqTopK(encoded, queries, "vec_id", "embedding", p, topK = 10)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val base = emb.select(col("vec_id").cast("long").as("id"),
      transform(col("embedding"), x => x.cast("double")).as("e"))
    val q = base.filter(col("id") < 5).select(col("id").as("query_id"), col("e").as("qe"))
    val exact = base.crossJoin(broadcast(q))
      .filter(col("id") =!= col("query_id"))
      .withColumn("cos", Similarity.dot(col("e"), col("qe")) /
        (sqrt(Similarity.dot(col("e"), col("e"))) * sqrt(Similarity.dot(col("qe"), col("qe")))))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("query_id")
          .orderBy(col("cos").desc, col("id").asc)))
      .filter(col("rank") <= 10)
      .select(col("query_id"), col("id")).as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val recalls = exact.map { case (qid, truth) =>
      approx.getOrElse(qid, Set.empty).intersect(truth).size.toDouble / truth.size }
    val meanRecall = recalls.sum / recalls.size
    // int8 affine is near-lossless on unit-ish embeddings
    assert(meanRecall >= 0.9, s"mean recall@10 $meanRecall too low")
  }

  test("SQ handles null vectors, short vectors, and all-null dims explicitly") {
    val rows: Seq[(Long, Seq[java.lang.Double])] = Seq(
      (1L, Seq[java.lang.Double](0.0, 10.0, null)),  // dim 2 all-null across corpus
      (2L, Seq[java.lang.Double](5.0, 20.0, null)),
      (3L, Seq[java.lang.Double](2.5)),              // short vector
      (4L, null)                                     // null vector
    )
    val df = rows.toDF("vec_id", "embedding")
    val p = Quantization.sqFit(df, "embedding") // must not NPE on the null dim
    assert(p.mins.length === 3)
    assert(p.mins(2) === 0.0 && p.scales(2) === 0.0) // all-null dim -> degenerate
    val enc = Quantization.sqEncode(df, "vec_id", "embedding", p)
      .select(col("id"), col("codes")).as[(Long, Seq[Int])].collect().toMap
    assert(enc.values.forall(_.length === 3)) // full fitted width, no nulls
    assert(enc(1L) === Seq(0, 0, 0) && enc(2L) === Seq(255, 255, 0))
    assert(enc(3L) === Seq(128, 0, 0)) // present dim encoded; missing -> 0
    assert(enc(4L) === Seq(0, 0, 0))   // null vector -> all-min codes
  }
}
